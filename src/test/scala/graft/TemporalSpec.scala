package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Gap-fill interpolation and funnel ordering semantics on planted
  * fixtures; the corpus-level gates are the DuckDB oracles. */
class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap-fill densifies each user's span and interpolates linearly") {
    // user 1: hours 0, 3 observed (values 10.0, 40.0) → hours 1, 2
    // interpolate to 20, 30; user 2: single hour → no gaps
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 00:50:00"), 10.0), // same hour, same value
      (1L, ts("2024-01-01 03:30:00"), 40.0),
      (2L, ts("2024-01-01 05:00:00"), 7.5))
      .toDF("user_id", "ts", "value")
    val got = Temporal.gapFillHourly(ev)
      .orderBy("user_id", "epoch_hr").collect()
    val hr0 = ts("2024-01-01 00:00:00").getTime / 3600000
    assert(got.length == 5, s"4 hours for user 1 + 1 for user 2: ${got.toSeq}")
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(1)).toSeq == Seq(hr0, hr0 + 1, hr0 + 2, hr0 + 3))
    assert(u1.map(_.getDouble(2)).toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    assert(u1.map(_.getBoolean(3)).toSeq == Seq(true, false, false, true))
    // observed hours carry the exact hourly mean, not an interpolation
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getDouble(2) == 7.5 && u2(0).getBoolean(3))
  }

  test("gap-fill one-pass lead/explode form ≡ the grid-join + two-window reference") {
    // r17 optimization gate: the rewrite (single lead() window + per-
    // segment explode) must be row- and BIT-identical to the original
    // grid-join + asc/desc running-frame form on an adversarial fixture:
    // many users, irregular gaps (1..37 h), duplicate in-hour events,
    // single-observation users, and values whose interpolation is
    // float-inexact (thirds) so any operation-order drift would show.
    val rng = new scala.util.Random(42)
    val rows = (1L to 25L).flatMap { u =>
      var h = rng.nextInt(48).toLong
      (0 until (1 + rng.nextInt(9))).flatMap { _ =>
        h += 1 + rng.nextInt(37)
        val reps = 1 + rng.nextInt(3)
        (0 until reps).map { r =>
          (u, new Timestamp(h * 3600000L + r * 60000L),
            (rng.nextInt(1000) + 1).toDouble / 3.0)
        }
      }
    }
    val ev = rows.toDF("user_id", "ts", "value")
    // reference: the pre-r17 shape, verbatim
    import org.apache.spark.sql.expressions.Window
    val hourly = ev
      .select($"user_id", floor($"ts".cast("long") / lit(3600)).cast("long").as("hr"),
        $"value")
      .filter($"value".isNotNull)
      .groupBy($"user_id", $"hr")
      .agg(graft.functions.Exprs.exactAvg($"value").as("v"))
    val grid = hourly.groupBy($"user_id")
      .agg(min($"hr").as("lo"), max($"hr").as("hi"))
      .select($"user_id", explode(sequence($"lo", $"hi")).as("hr"))
    val joined = grid.join(hourly, Seq("user_id", "hr"), "left")
    val wPrev = Window.partitionBy("user_id").orderBy($"hr".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy($"hr".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = joined
      .withColumn("pv", last($"v", ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when($"v".isNotNull, $"hr"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", last($"v", ignoreNulls = true).over(wNext))
      .withColumn("nh", last(when($"v".isNotNull, $"hr"), ignoreNulls = true).over(wNext))
      .withColumn("filled",
        when($"v".isNotNull, $"v").otherwise(
          $"pv" + (($"nv" - $"pv") * ($"hr" - $"ph").cast("double")) /
            ($"nh" - $"ph").cast("double")))
      .select($"user_id", $"hr".as("epoch_hr"),
        $"filled".as("value"), $"v".isNotNull.as("is_observed"))
      .orderBy("user_id", "epoch_hr").collect()
    val got = Temporal.gapFillHourly(ev)
      .orderBy("user_id", "epoch_hr").collect()
    assert(got.length == ref.length, s"${got.length} vs ${ref.length} rows")
    got.zip(ref).foreach { case (g, r) =>
      assert(g.getLong(0) == r.getLong(0) && g.getLong(1) == r.getLong(1))
      // bit equality, not tolerance: same IEEE ops in the same order
      assert(java.lang.Double.doubleToLongBits(g.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"value drift at (${g.getLong(0)}, ${g.getLong(1)}): " +
          s"${g.getDouble(2)} vs ${r.getDouble(2)}")
      assert(g.getBoolean(3) == r.getBoolean(3))
    }
  }

  test("funnel requires strict ordering: later steps only count after earlier ones") {
    val ev = Seq(
      // user 1: full ordered chain
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: purchase BEFORE the first view → stops at click
      (2L, "purchase", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // user 3: click before view → stops at step 1
      (3L, "click", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      // user 4: no view at all → not in the funnel
      (4L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.eventFunnel(ev).orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1), s"got $got")
    // the earliest qualifying chain is reported
    val u1 = Temporal.eventFunnel(ev).filter($"user_id" === 1L).head()
    assert(u1.getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(u1.getTimestamp(3) == ts("2024-01-01 10:10:00"))
  }

  test("rolling z-score flags a planted spike and only the spike") {
    // 20 steady values then one spike for user 1; user 2 all steady.
    // window=5, minHistory=3 keeps the fixture small.
    val base = (0 until 20).map(i =>
      (1L, 100L + i, ts(f"2024-01-01 ${i / 4}%02d:${(i % 4) * 15}%02d:00"), 10.0 + (i % 2) * 0.5))
    val spike = Seq((1L, 200L, ts("2024-01-01 06:00:00"), 500.0))
    val other = (0 until 6).map(i =>
      (2L, 300L + i, ts(f"2024-01-01 0$i:00:00"), 3.0))
    val ev = (base ++ spike ++ other).toDF("user_id", "event_id", "ts", "value")
    val got = Temporal.rollingAnomalies(ev, window = 5, k = 3, minHistory = 3)
      .collect()
    val anomalies = got.filter(_.getBoolean(5)).map(_.getLong(1)).toSet
    assert(anomalies == Set(200L), s"expected only the spike, got $anomalies")
    // z² of steady rows is small; the spike's z² is enormous
    val spikeZ = got.find(_.getLong(1) == 200L).get.getDouble(4)
    assert(spikeZ > 1000, s"spike z² $spikeZ")
    // zero-variance baseline (user 2, all equal): z² is NULL by contract
    // and equal values are NOT flagged (num = 0)
    val steady = got.filter(r => r.getLong(0) == 2L)
    assert(steady.forall(r => r.isNullAt(4) && !r.getBoolean(5)))
  }

  test("conversion latency: purchases before the first view never count") {
    val ev = Seq(
      // user 1: purchase BEFORE first view (ignored), converts 90s after
      (1L, ts("2024-01-01 09:00:00"), 1L, "purchase", 1.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (3L, ts("2024-01-01 10:01:30"), 1L, "purchase", 1.0),
      // user 2: views, never converts
      (4L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0),
      // user 3: purchase only — not a viewer, not a converter
      (5L, ts("2024-01-01 12:00:00"), 3L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Temporal.conversionLatency(ev).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 1)
    assert(r.getDouble(4) == 90.0, "median latency must be the 90s conversion")
  }

  test("cohort retention: offsets count from first-seen week, ratios exact") {
    // users 1,2 first seen in week of Jan 1 (Mon); user 1 returns two
    // weeks later; user 3 starts the next week
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00"), 1L), // cohort W0
      (2L, ts("2024-01-03 10:00:00"), 1L),
      (3L, ts("2024-01-16 10:00:00"), 1L), // W0 + offset 2
      (4L, ts("2024-01-04 10:00:00"), 2L), // cohort W0, never returns
      (5L, ts("2024-01-09 10:00:00"), 3L)  // cohort W1
    ).map { case (e, t, u) => (e, t, u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Temporal.cohortRetention(ev).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 2)) == ((1L, 2L, 0.5)))
    assert(out(("2024-01-08", 0)) == ((1L, 1L, 1.0)))
    assert(out.size == 3, "no phantom offsets")
  }

  test("debounce is chain-dependent: a burst inside delta keeps only its head") {
    // user 1: 10:00, 10:30, 10:50, 11:10 with delta=1h — chain keeps
    // 10:00 and 11:10; lag-based thinning would re-arm on 10:30/10:50
    // and drop 11:10 (gap to 10:50 is 20 min) — the distinguishing case
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, "view", 1.0),
      (3L, ts("2024-01-01 10:50:00"), 1L, "view", 1.0),
      (4L, ts("2024-01-01 11:10:00"), 1L, "view", 1.0),
      (5L, ts("2024-01-02 09:00:00"), 2L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val kept = Temporal.debounce(ev, 3600L).orderBy("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 4L, 5L))
    // simultaneous events: only the smaller event_id survives
    val dup = Seq(
      (10L, ts("2024-01-01 10:00:00"), 9L, "view", 1.0),
      (11L, ts("2024-01-01 10:00:00"), 9L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Temporal.debounce(dup, 60L).collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("streaming debounce carries the chain across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Ev
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamingOps.debounceStream(src.toDS(), 3600L)
      .writeStream.format("memory").queryName("debounced")
      .outputMode("append").start()
    // batch 1: head of a burst admitted
    src.addData(Ev(1L, ts("2024-01-01 10:00:00"), 1L),
      Ev(1L, ts("2024-01-01 10:30:00"), 2L))
    q.processAllAvailable()
    // batch 2: still inside the burst window of the ADMITTED head →
    // dropped; then one past the window → admitted
    src.addData(Ev(1L, ts("2024-01-01 10:50:00"), 3L),
      Ev(1L, ts("2024-01-01 11:10:00"), 4L))
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("debounced").orderBy("event_id")
      .collect().map(_.getLong(2)).toSeq
    assert(admitted == Seq(1L, 4L))
  }

  test("corpus gap-fill output is dense and anchored on observed hours") {
    val out = Temporal.qGapFillHourly(spark, sf)
    val perUser = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("epoch_hr") - min("epoch_hr") + 1).as("span"),
        sum(when($"is_observed", 1).otherwise(0)).as("obs"))
      .collect()
    perUser.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "grid must cover the span densely")
      assert(r.getLong(3) > 0, "every user has at least one observation")
    }
  }
}
