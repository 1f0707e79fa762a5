package graft

import org.apache.spark.sql.functions._

import graft.operators.Growth

/** User-growth accounting and rank-normalization semantics. */
class GrowthSpec extends SparkSpecBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("user growth: new vs returning vs cumulative on a planted stream") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"), // returning
      (4L, ts("2024-01-02 11:00:00"), 3L, "view", 1.0, "{}"), // new
      (5L, ts("2024-01-04 10:00:00"), 1L, "view", 1.0, "{}")) // returning only
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Growth.userGrowth(events).orderBy(col("day")).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 2L)))
    assert(out("2024-01-02") == ((1L, 2L, 3L)))
    assert(out("2024-01-04") == ((0L, 1L, 3L)))
  }

  test("user growth reconciles on the fixture") {
    val events = Tables.events(spark, sf)
    val out = Growth.userGrowth(events).orderBy(col("day")).collect()
    // final cumulative equals the exact distinct user count
    assert(out.last.getLong(3) ==
      events.select(col("user_id")).distinct().count())
    // cumulative is non-decreasing and sums the news
    val news = out.map(_.getLong(1))
    val tot = out.map(_.getLong(3))
    assert(tot.toSeq == news.scanLeft(0L)(_ + _).tail.toSeq)
    // active ≥ new every day
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("rank normalization matches the single-sort window transform") {
    val events = Tables.events(spark, sf)
    val got = Growth.rankNormalize(events, nPartitions = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val n = events.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value"), col("event_id"))
    val want = events.select(col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("pct_milli", floor(col("rnk") * lit(1000L) / lit(n)).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // bounds: max rank has pct 1000, pct in (0, 1000]
    assert(got.values.map(_._2).max == 1000L)
    assert(got.values.forall { case (_, p) => p >= 0L && p <= 1000L })
  }
}
