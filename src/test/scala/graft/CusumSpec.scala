package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Cusum

class CusumSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-02-$day%02d $hour%02d:30:00")

  test("a planted 2x level shift alarms after the shift, never before") {
    // 48 hours at 10 events/hour, then 24 hours at 20 — one event row
    // per (hour, i); the detector sees hourly counts
    val rows = (0 until 72).flatMap { t =>
      val rate = if (t < 48) 10 else 20
      (0 until rate).map(i => ("load", ts(1 + t / 24, t % 24), i))
    }
    val events = rows.toDF("event_type", "ts", "i")
    val out = Cusum.hourlyCusum(events).orderBy(col("h")).collect()
    assert(out.length == 72)
    val alarms = out.map(_.getAs[Boolean]("alarm"))
    val firstAlarm = alarms.indexOf(true)
    assert(firstAlarm >= 48, s"alarm before the shift at hour $firstAlarm")
    assert(firstAlarm > 0 && firstAlarm < 72, "shift never detected")
    // once the sustained shift is accumulated, the alarm stays on
    assert(alarms.drop(firstAlarm).forall(identity))
    // pre-shift CUSUM decays to zero (x below the 1.1-mean slack line)
    assert(out.take(48).forall(_.getAs[Long]("cusum_d") == 0L))
  }

  test("recurrence hand-check: D_t = max(0, D_prev + 10*n*x - 11*sx)") {
    // n=3, counts 2,1,3 → sx=6: increments 10*3*x-66 = -6, -36, 24
    val events = (
      (0 until 2).map(i => ("a", ts(1, 0), i)) ++
      (0 until 1).map(i => ("a", ts(1, 1), i)) ++
      (0 until 3).map(i => ("a", ts(1, 2), i))).toDF("event_type", "ts", "i")
    val d = Cusum.hourlyCusum(events).orderBy(col("h")).collect()
      .map(_.getAs[Long]("cusum_d")).toSeq
    assert(d == Seq(0L, 0L, 24L), s"got $d")
  }

  test("streaming cusum with batch calibration equals the batch detector") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Cusum.qHourlyCusum(spark, sf).collect()
    // calibration = the reference the batch form derives internally
    val calib = batch.groupBy(_.getString(0)).map { case (t, rows) =>
      t -> (rows.length.toLong, rows.map(_.getLong(2)).sum)
    }
    // feed the dense hourly series in hour-ordered thirds
    val series = batch.map(r => StreamingOps.HourCount(
      r.getString(0), r.getTimestamp(1), r.getLong(2))).sortBy(_.h.getTime)
    val src = MemoryStream[(String, java.sql.Timestamp, Long)]
    val ds = src.toDS().map { case (t, h, x) => StreamingOps.HourCount(t, h, x) }
    val q = StreamingOps.cusumStream(ds, calib)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    series.grouped(series.length / 3 + 1).foreach { chunk =>
      src.addData(chunk.map(c => (c.event_type, c.h, c.x)).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("cusum_out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val expected = batch.map(r => (r.getString(0), r.getTimestamp(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(streamed == expected,
      s"stream ${streamed.size} rows vs batch ${expected.size}")
  }

  test("fixture output is the dense grid and alarm implies the threshold") {
    val out = Cusum.qHourlyCusum(spark, sf).cache()
    val grid = out.groupBy(col("event_type")).count().collect()
    assert(grid.map(_.getLong(1)).distinct.length == 1, "uneven grids")
    val bad = out.filter(col("alarm") && col("cusum_d") <= lit(0L)).count()
    assert(bad == 0)
  }
}
