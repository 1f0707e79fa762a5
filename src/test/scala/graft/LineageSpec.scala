package graft

import org.apache.spark.sql.functions._

import graft.plans.Lineage

class LineageSpec extends SparkSpecBase {
  import spark.implicits._

  test("q3-style star join: revenue traces to price+discount, keys to their dims") {
    val df = graft.operators.Tpch.q3ShippingPriority(spark, sf)
    val lin = Lineage.columnLineage(df).toMap
    assert(lin("revenue").toSet ==
      Set("lineitem.parquet.l_extendedprice", "lineitem.parquet.l_discount"),
      lin("revenue").toString)
    assert(lin("o_orderdate") == Seq("orders.parquet.o_orderdate"))
    assert(lin("l_orderkey") == Seq("lineitem.parquet.l_orderkey"))
  }

  test("aggregates, windows and generators all resolve through") {
    val docs = Tables.documents(spark, sf)
    val exploded = docs
      .select($"doc_id", explode(graft.functions.TextFns.words($"text")).as("term"))
      .groupBy($"term").agg(countDistinct($"doc_id").as("df"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"df".desc, $"term")))
    val lin = Lineage.columnLineage(exploded).toMap
    assert(lin("term") == Seq("documents.parquet.text"))
    assert(lin("df").toSet ==
      Set("documents.parquet.doc_id"), lin("df").toString)
    // the window rank depends on both its order keys' sources
    assert(lin("rnk").toSet ==
      Set("documents.parquet.doc_id", "documents.parquet.text"))
  }

  test("union merges positional sources; filters and sorts are transparent") {
    val a = Tables.orders(spark, sf).select($"o_orderkey".as("k"))
    val b = Tables.lineitem(spark, sf).select($"l_orderkey".as("k"))
    val lin = Lineage.columnLineage(
      a.union(b).filter($"k" > 100).orderBy($"k")).toMap
    assert(lin("k").toSet ==
      Set("orders.parquet.o_orderkey", "lineitem.parquet.l_orderkey"))
  }

  test("lineage table renders for export") {
    val t = Lineage.lineageTable(graft.operators.Silver.qClean(spark, sf))
    assert(t.count() > 0)
    assert(t.columns.toSeq == Seq("output_column", "source_columns"))
  }
}
