package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dynamic partition pruning over a date-partitioned fact layout — the
  * Spark-native mechanism that makes "join a 100 TB fact to a filtered
  * dim" read only the matching partitions: the optimizer plants a
  * runtime subquery on the fact scan's PARTITION column, fed by the
  * broadcast dim after its filters apply, so partitions are pruned by
  * VALUES ONLY KNOWN AT RUNTIME (a static filter could never express
  * "years where the dim row qualifies"). Static pruning covers literal
  * predicates; DPP covers the star-join shape every warehouse query has.
  *
  * Layout: lineitem rewritten once, hive-partitioned by ship year
  * ([[graft.Serving]] build-once registry, like the PQ/IVF/BM25 serving
  * layouts). Query: revenue per year joined to a year dim keeping only
  * years with ≥ 2 eligible quarters — a dim predicate whose surviving
  * keys exist only at runtime. The plan gate (`PlanSpec`) asserts
  * `dynamicpruning` lands in the scan's PartitionFilters; the oracle
  * gate pins the values. */
object Dpp {

  def layoutFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("lineitem_by_year", dir) { path =>
      Tables.lineitem(spark, dir)
        .withColumn("ship_year", year(col("l_shipdate")))
        .write.mode("overwrite").partitionBy("ship_year").parquet(path)
    }

  /** Year dim derived from orders: a year qualifies when it contains
    * ≥ 2 distinct order quarters (deterministic, data-dependent — the
    * kind of predicate only a runtime subquery can push to the fact). */
  def yearDim(orders: DataFrame): DataFrame =
    orders
      .select(year(col("o_orderdate")).as("ship_year"),
        quarter(col("o_orderdate")).as("q"))
      .groupBy(col("ship_year"))
      .agg(countDistinct(col("q")).as("n_quarters"))
      .filter(col("n_quarters") >= 2)

  def revenueByYearDpp(fact: DataFrame, dim: DataFrame): DataFrame =
    fact.join(broadcast(dim), Seq("ship_year"))
      .groupBy(col("ship_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1) - col("l_discount").cast("decimal(6,2)")))
          .cast("double").as("revenue"))

  def qRevenueByYearDpp(spark: SparkSession, dir: String): DataFrame = {
    val fact = spark.read.parquet(layoutFor(spark, dir))
    revenueByYearDpp(fact, yearDim(Tables.orders(spark, dir)))
      .orderBy(col("ship_year"))
  }

  def oRevenueByYearDpp: String =
    """WITH dim AS (
      |  SELECT year(CAST(o_orderdate AS DATE)) AS ship_year,
      |         count(DISTINCT quarter(CAST(o_orderdate AS DATE))) AS nq
      |  FROM orders GROUP BY 1 HAVING count(DISTINCT quarter(CAST(o_orderdate AS DATE))) >= 2)
      |SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS ship_year,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE year(CAST(l_shipdate AS DATE)) IN (SELECT ship_year FROM dim)
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
