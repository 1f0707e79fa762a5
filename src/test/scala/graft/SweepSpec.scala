package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sweep

class SweepSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("peak concurrency: planted overlaps, half-open boundary semantics") {
    // events at :00, :30, :50 each held 60s → overlap of 3 in [:50, 1:00)
    // plus one event at exactly 1:00 — the :00 event's end (1:00) sorts
    // BEFORE that start (half-open), so it must NOT raise the peak to 4
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 10:00:30")),
      (3L, ts("2024-03-01 10:00:50")), (4L, ts("2024-03-01 10:01:00")))
      .toDF("event_id", "ts").withColumn("event_type", lit("a"))
    val r = Sweep.peakConcurrency(events).collect().head
    assert(r.getAs[Long]("peak_concurrency") == 3L, r.toString)
    assert(r.getAs[Long]("n_intervals") == 4L)
    assert(r.getAs[Timestamp]("peak_at") == ts("2024-03-01 10:00:50"))
  }

  test("disjoint intervals never exceed concurrency 1") {
    val events = (0 until 10).map(i =>
      (i.toLong, ts(f"2024-03-01 1$i%01d:00:00"))).toDF("event_id", "ts")
      .withColumn("event_type", lit("b"))
    val r = Sweep.peakConcurrency(events).collect().head
    assert(r.getAs[Long]("peak_concurrency") == 1L)
  }

  test("mase: a perfectly weekly series scores 0, a trending one scores high") {
    // 21 days, weekly pattern repeats exactly → lag-7 error 0
    val weekly = (0 until 21).flatMap { d =>
      val n = 3 + (d % 7)
      (0 until n).map(i => (d.toLong * 100 + i,
        ts(f"2024-03-${d + 1}%02d 09:00:00")))
    }.toDF("event_id", "ts").withColumn("event_type", lit("w"))
    val r = Sweep.forecastBacktest(weekly).collect().head
    assert(r.getAs[Long]("mae7_milli") == 0L && r.getAs[Long]("mase_milli") == 0L)
    assert(r.getAs[Long]("n_days_scored") == 14L)
  }

  test("fixture backtest: scored-day counts consistent across types") {
    val out = Sweep.qForecastBacktest(spark, sf).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days_scored") > 0)
      assert(r.getAs[Long]("mae7_milli") >= 0 && r.getAs[Long]("mae1_milli") >= 0)
    }
  }
}
