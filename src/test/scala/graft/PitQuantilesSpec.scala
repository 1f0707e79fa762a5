package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pit, Quantiles, Scd}

/** PIT-join interval semantics (incl. zero-length versions) and
  * scalable-quantile equality with the single-sort form. */
class PitQuantilesSpec extends SparkSpecBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pit join picks the survivor of a zero-length version and drops early facts") {
    import spark.implicits._
    // two same-instant priority changes → v1 is zero-length, v2 survives
    val orders = Seq(
      (1L, 1L, "O", 10.0, ts("1996-01-01 00:00:00"), "A"),
      (2L, 1L, "O", 10.0, ts("1996-01-01 00:00:00"), "B"),
      (3L, 1L, "O", 10.0, ts("1997-01-01 00:00:00"), "C"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val history = Scd.scd2Build(orders)
    val facts = Seq(
      (100L, 1, 1L, ts("1996-01-01 00:00:00")), // at the shared instant → B
      (100L, 2, 1L, ts("1996-06-01 00:00:00")), // inside v2 → B
      (100L, 3, 1L, ts("1997-05-01 00:00:00")), // open version → C
      (100L, 4, 1L, ts("1995-01-01 00:00:00"))) // before first version → drop
      .toDF("l_orderkey", "l_linenumber", "custkey", "l_shipdate")
    val out = Pit.pitJoin(history, facts).collect()
      .map(r => r.getInt(1) -> r.getAs[String]("priority")).toMap
    assert(out == Map(1 -> "B", 2 -> "B", 3 -> "C"))
  }

  test("pit join on the fixture: every hit's interval contains the fact ts") {
    val orders = Tables.orders(spark, sf)
    val history = Scd.scd2Build(orders).cache()
    val joined = Pit.qPitJoin(spark, sf)
    val bad = joined.join(
      history.select(col("o_custkey").as("custkey"), col("version"),
        col("valid_from"), col("valid_to")),
      Seq("custkey", "version"))
      .filter(col("ship_ts") < col("valid_from") ||
        (col("valid_to").isNotNull && col("ship_ts") >= col("valid_to")))
    assert(bad.count() == 0L)
    assert(joined.count() > 0L)
    history.unpersist()
  }

  test("scalable quantiles equal the single-sort percentile_disc") {
    val events = Tables.events(spark, sf)
    val got = Quantiles.quantilesScalable(events, nPartitions = 5)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val n = events.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value"), col("event_id"))
    val ranked = events.withColumn("rn", row_number().over(w)).cache()
    Quantiles.Ps.foreach { p =>
      val want = ranked.filter(col("rn") === math.ceil(p * n).toLong)
        .select(col("value")).collect().head.getDouble(0)
      assert(got(p) == want, s"p=$p")
    }
    ranked.unpersist()
    // partition-count invariance
    val got2 = Quantiles.quantilesScalable(events, nPartitions = 2)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == got2)
  }
}
