package graft

import org.apache.spark.sql.functions._

import graft.operators.Ewma

/** EWMA lag polynomial: exact integer weights, null until the lookback
  * fills, spike flag on cross-multiplied integers. */
class EwmaSpec extends SparkSpecBase {

  test("weights telescope: Σ 7^i·8^(T−1−i) = 8^T − 7^T, newest heaviest") {
    val pow8 = math.pow(8, Ewma.Terms).toLong
    val pow7 = math.pow(7, Ewma.Terms).toLong
    assert(Ewma.WeightSum == pow8 - pow7)
    assert(Ewma.weight(0) > Ewma.weight(Ewma.Terms - 1))
    assert((0 until Ewma.Terms - 1).forall(i => Ewma.weight(i) > Ewma.weight(i + 1)))
  }

  test("constant series smooths to itself; a 3x day trips the flag") {
    val rows = Ewma.qEwmaDaily(spark, sf).collect()
    assert(rows.nonEmpty)
    // lookback head: the first Terms−1 days per type carry null baseline
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      sorted.take(Ewma.Terms - 1).foreach { r =>
        assert(r.isNullAt(3) && r.isNullAt(4),
          s"incomplete window must emit null baseline: $r")
      }
      sorted.drop(Ewma.Terms - 1).foreach { r =>
        assert(!r.isNullAt(3) && !r.isNullAt(4))
        // fixed-point baseline is positive and day-count-scaled
        assert(r.getLong(3) > 0)
        // the flag definition, re-derived: c·Σw > 2·wsum ⇔ c·1000 > 2·ewma
        // (up to the floor) — check the exact integer inequality instead
        val c = r.getLong(2)
        val ewmaMilli = r.getLong(3)
        val spike = r.getInt(4)
        // spike=1 implies today's count clearly above baseline; 0 implies not
        if (spike == 1) assert(c * 1000 > ewmaMilli,
          s"flagged day must sit above its floor-divided baseline: $r")
      }
    }
  }

  test("exact recurrence on a crafted series: constant then spike") {
    import spark.implicits._
    val days = (1 to 12).map(d => (f"2024-01-$d%02d", if (d == 11) 30L else 10L))
    // feed events with exactly c rows per day — the operator's own daily
    // aggregate reconstructs the series
    val events = days.flatMap { case (ds, c) =>
      (1 to c.toInt).map(i => (ds + " 12:00:00", i.toLong))
    }.toDF("tss", "event_id")
      .select(lit("t").as("event_type"), to_timestamp(col("tss")).as("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    events
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(tmp + "/events.parquet")
    val out = Ewma.qEwmaDaily(spark, tmp).collect()
      .map(r => r.getDate(1).toString ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    // constant 10/day: once filled, ewma_milli = floor(10·Σw·1000/Σw) = 10000
    assert(out("2024-01-08") == ((10000L, 0)))
    assert(out("2024-01-10") == ((10000L, 0)))
    // spike day: 30 vs a baseline near 10 ⇒ flag (30·Σw > 2·wsum)
    assert(out("2024-01-11")._2 == 1)
    // day after: the spike enters the baseline with the w1 weight;
    // wsum = 30·w1 + 10·(Σw − w1 − w0) + 10·w0 … recompute exactly
    val wsum12 = (0 until Ewma.Terms).map { i =>
      val c = if (i == 1) 30L else 10L; c * Ewma.weight(i) }.sum
    assert(out("2024-01-12") == ((wsum12 * 1000 / Ewma.WeightSum,
      if (10L * Ewma.WeightSum > 2L * wsum12) 1 else 0)))
  }

  test("streaming ewma over chunked arrivals equals the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Ewma.qEwmaDaily(spark, sf).collect()
    val series = batch.map(r => StreamingOps.DayCount(
      r.getString(0), r.getDate(1), r.getLong(2))).sortBy(_.d.getTime)
    val src = MemoryStream[(String, java.sql.Date, Long)]
    val ds = src.toDS().map { case (t, d, c) => StreamingOps.DayCount(t, d, c) }
    val q = StreamingOps.ewmaStream(ds)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    // thirds split the lookback window across micro-batches, so the
    // carried state (not batch locality) must supply the missing lags
    series.grouped(series.length / 3 + 1).foreach { chunk =>
      src.addData(chunk.map(c => (c.event_type, c.d, c.c)).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)))
    val streamed = spark.table("ewma_out").collect().map(key).toSet
    val expected = batch.map(key).toSet
    assert(streamed == expected,
      s"stream ${streamed.size} rows vs batch ${expected.size}")
  }

  test("a day arriving out of order across micro-batches is dropped, not folded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def day(d: Int) = java.sql.Date.valueOf(f"2024-02-$d%02d")
    val src = MemoryStream[(String, java.sql.Date, Long)]
    val ds = src.toDS().map { case (t, d, c) => StreamingOps.DayCount(t, d, c) }
    val q = StreamingOps.ewmaStream(ds)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_late").start()
    // batch 1: days 1..10 in order
    src.addData((1 to 10).map(i => ("t", day(i), 10L)))
    q.processAllAvailable()
    // batch 2: day 3 AGAIN (out of order across batches) + day 11
    src.addData(Seq(("t", day(3), 999L), ("t", day(11), 10L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ewma_late").collect()
      .map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    // the stale day-3 row must NOT re-emit (its first emission stands)
    assert(rows("2024-02-03") == 10L, "stale re-arrival replaced the row")
    assert(rows.size == 11, s"expected 11 distinct days, got ${rows.size}")
    // and day 11's baseline is uncorrupted by the 999 count: on a flat
    // all-10s series the ewma is exactly 10000 milli
    val d11 = spark.table("ewma_late").collect()
      .find(_.getDate(1).toString == "2024-02-11").get
    assert(d11.getLong(3) == 10000L,
      s"baseline corrupted by the out-of-order day: ${d11.getLong(3)}")
    assert(d11.getInt(4) == 0)
  }

  test("state version shim: a foreign-version checkpoint fails loudly, current version folds on") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingOps
    val day = java.sql.Date.valueOf("2024-02-01")
    val rows = Iterator(StreamingOps.DayCount("t", day, 10L))
    // a state tuple written by a PREVIOUS version (same shape, older
    // semantics — the class of break Spark's schema checker cannot
    // see) must be refused by name, not folded into the recurrence
    import org.apache.spark.api.java.Optional
    val stale = TestGroupState.create[(Int, Long, Seq[Long])](
      Optional.of((StreamingOps.EwmaStateVersion - 1,
        Long.MinValue, Seq.empty[Long])),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, Optional.empty[Long](), hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      StreamingOps.ewmaFold("t", rows, stale).toList
    }
    assert(e.getMessage.contains("fresh checkpoint"),
      s"upgrade failure must name the remediation: ${e.getMessage}")
    // the current version folds normally and re-stamps itself
    val ok = TestGroupState.create[(Int, Long, Seq[Long])](
      Optional.of((StreamingOps.EwmaStateVersion,
        Long.MinValue, Seq.empty[Long])),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, Optional.empty[Long](), hasTimedOut = false)
    val out = StreamingOps.ewmaFold("t",
      Iterator(StreamingOps.DayCount("t", day, 10L)), ok).toList
    assert(out.size == 1 && out.head.c == 10L)
    assert(ok.get._1 == StreamingOps.EwmaStateVersion)
  }
}
