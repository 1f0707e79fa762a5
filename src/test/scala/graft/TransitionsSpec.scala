package graft

import org.apache.spark.sql.functions._

import graft.operators.Transitions

/** Transition-matrix and outlier-fence semantics on hand-built data. */
class TransitionsSpec extends SparkSpecBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("transition counts follow each user's time order, never cross users") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "click", 1.0, "{}"),
      // user 2 starts with click — no cross-user (click→view) from u1→u2
      (5L, ts("2024-01-01 11:00:00"), 2L, "click", 1.0, "{}"),
      (6L, ts("2024-01-01 11:01:00"), 2L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Transitions.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(4))).toMap
    // u1: view→click ×2, click→view ×1; u2: click→purchase ×1
    assert(m(("view", "click")) == ((2L, 1000L)))
    assert(m(("click", "view")) == ((1L, 500L)))
    assert(m(("click", "purchase")) == ((1L, 500L)))
    assert(m.size == 3)
  }

  test("transition probabilities per from-type sum to ≈1000 on the fixture") {
    val m = Transitions.qTransitions(spark, sf).cache()
    val sums = m.groupBy(col("from_type"))
      .agg(sum(col("prob_milli")).as("s"), count(lit(1)).as("k"))
      .collect()
    // floor rounding loses < 1 per destination type
    sums.foreach { r =>
      val s = r.getLong(1); val k = r.getLong(2)
      assert(s <= 1000 && s > 1000 - k, s"${r.getString(0)}: $s over $k cells")
    }
    m.unpersist()
  }

  test("last-touch attribution: window cutoff, tie order, and none-bucket") {
    import spark.implicits._
    val events = Seq(
      // u1: click then view then purchase → view wins (latest touch)
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-03 10:00:00"), 1L, "purchase", 1.0, "{}"),
      // u2: touch 8 days before purchase → outside window → none
      (4L, ts("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      (5L, ts("2024-01-09 10:00:01"), 2L, "purchase", 1.0, "{}"),
      // u3: purchase with no touch at all → none
      (6L, ts("2024-01-05 10:00:00"), 3L, "purchase", 1.0, "{}"),
      // u4: touch at the same instant as the purchase → attributed
      (7L, ts("2024-01-05 10:00:00"), 4L, "click", 1.0, "{}"),
      (8L, ts("2024-01-05 10:00:00"), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Attribution.lastTouch(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view" -> 1L, "none" -> 2L, "click" -> 1L))
  }

  test("streaming attribution equals the batch twin across micro-batches") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    val all = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect().sortBy(e => (e._2.getTime, e._3))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingOps.attributionStream(
      src.toDS().map { case (u, t, i, e) => StreamingOps.TEv(u, t, i, e) })
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
      src.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("attr_out")
      .groupBy(col("attributed_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Attribution.lastTouch(Tables.events(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.values.sum > 0)
  }

  test("outlier fences: planted extremes are counted on the right sides") {
    import spark.implicits._
    val base = (1 to 100).map(i =>
      (i.toLong, ts("2024-01-01 10:00:00"), 1L, "view", i.toDouble, "{}"))
    val spikes = Seq(
      (101L, ts("2024-01-01 10:00:00"), 1L, "spike", 1000.0, "{}"),
      (102L, ts("2024-01-01 10:00:00"), 1L, "spike", -1000.0, "{}"))
    val events = (base ++ spikes)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Transitions.outlierFences(events, nPartitions = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("spike") == ((2L, 1L, 1L)))
    assert(out("view") == ((100L, 0L, 0L)))
  }
}
