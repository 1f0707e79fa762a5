package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 build/apply semantics on the fixture and on planted mini-logs
  * (the oracle gate checks the full build against DuckDB). */
class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def ordersDf(rows: (Long, Long, String, String)*) =
    rows.map { case (okey, ckey, date, prio) => (okey, ckey, ts(date), prio) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")

  test("build collapses unchanged runs and closes versions in order") {
    val out = Scd.scd2Build(ordersDf(
      (1L, 7L, "2020-01-01", "LOW"),
      (2L, 7L, "2020-02-01", "LOW"),    // unchanged → same version
      (3L, 7L, "2020-03-01", "HIGH"),
      (4L, 7L, "2020-04-01", "LOW"))).orderBy("version").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("priority")).toSeq == Seq("LOW", "HIGH", "LOW"))
    assert(out(0).getAs[Timestamp]("valid_to") == ts("2020-03-01"))
    assert(out(1).getAs[Timestamp]("valid_to") == ts("2020-04-01"))
    assert(out(2).getAs[Timestamp]("valid_to") == null && out(2).getAs[Boolean]("is_current"))
    assert(out.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
  }

  test("same-day events break ties on order key deterministically") {
    val out = Scd.scd2Build(ordersDf(
      (2L, 7L, "2020-01-01", "HIGH"),
      (1L, 7L, "2020-01-01", "LOW"))).orderBy("version").collect()
    assert(out.map(_.getAs[String]("priority")).toSeq == Seq("LOW", "HIGH"))
  }

  test("apply equals from-scratch rebuild on the fixture orders") {
    val orders = Tables.orders(spark, sf)
    val cut = lit(Scd.ApplySplit).cast("timestamp")
    val applied = Scd.scd2Apply(
      Scd.scd2Build(orders.filter(col("o_orderdate") < cut)),
      orders.filter(col("o_orderdate") >= cut))
    val full = Scd.scd2Build(orders)
    assert(applied.count() == full.count())
    assert(applied.exceptAll(full).isEmpty && full.exceptAll(applied).isEmpty)
  }

  test("apply: batch-only key builds fresh; boundary-equal priority stays open") {
    val history = Scd.scd2Build(ordersDf((1L, 7L, "2020-01-01", "LOW")))
    val out = Scd.scd2Apply(history, ordersDf(
      (2L, 7L, "2020-02-01", "LOW"),    // same priority → version 1 stays open
      (3L, 9L, "2020-02-01", "HIGH")))  // new key
      .orderBy("o_custkey", "version").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("o_custkey") == 7L && out(0).getAs[Boolean]("is_current"))
    assert(out(0).getAs[Timestamp]("valid_from") == ts("2020-01-01"))
    assert(out(1).getAs[Long]("o_custkey") == 9L && out(1).getAs[Long]("version") == 1L)
  }
}
