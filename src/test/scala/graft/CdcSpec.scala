package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Changelog apply: insert/update/delete/reinsert semantics, the
  * apply ≡ rebuild invariant at every cut point, and batch-key
  * restriction (untouched snapshot rows pass through bit-identical). */
class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user_id, event_type, value): user 1 updated twice;
  // user 2 deleted last; user 3 deleted then resurrected; user 4
  // delete-only; user 5 single insert
  private def log = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 1.0),
    (2L, ts("2024-01-02 10:00:00"), 1L, "view", 2.0),
    (3L, ts("2024-01-01 11:00:00"), 2L, "signup", 3.0),
    (4L, ts("2024-01-03 11:00:00"), 2L, "error", 0.0),
    (5L, ts("2024-01-01 12:00:00"), 3L, "signup", 4.0),
    (6L, ts("2024-01-02 12:00:00"), 3L, "error", 0.0),
    (7L, ts("2024-01-04 12:00:00"), 3L, "purchase", 5.0),
    (8L, ts("2024-01-02 13:00:00"), 4L, "error", 0.0),
    (9L, ts("2024-01-05 09:00:00"), 5L, "click", 6.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("build folds the log: latest wins, tombstone drops, reinsert revives") {
    val state = Cdc.cdcBuild(Cdc.asChangelog(log)).orderBy("user_id").collect()
    assert(state.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    val u1 = state(0)
    assert(u1.getString(1) == "view" && u1.getDouble(2) == 2.0 && u1.getLong(4) == 2L)
    val u3 = state(1)
    assert(u3.getString(1) == "purchase" && u3.getLong(4) == 7L)
  }

  test("apply ≡ rebuild at every cut point") {
    val changes = Cdc.asChangelog(log)
    val full = Cdc.cdcBuild(changes).orderBy("user_id").collect().toSeq
    Seq("2024-01-01 11:30:00", "2024-01-02 12:30:00", "2024-01-03 12:00:00",
      "2024-01-06 00:00:00").foreach { cut =>
      val snap = Cdc.cdcBuild(changes.filter($"ts" < ts(cut)))
      val batch = log.filter($"ts" >= ts(cut))
      val merged = Cdc.cdcApply(snap, batch).orderBy("user_id").collect().toSeq
      assert(merged == full, s"apply at $cut diverged from rebuild")
    }
  }

  test("same-timestamp changes break ties by event_id (LSN order)") {
    val t = ts("2024-01-01 10:00:00")
    val dup = Seq(
      (10L, t, 9L, "view", 1.0),
      (11L, t, 9L, "click", 2.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val s = Cdc.cdcBuild(Cdc.asChangelog(dup)).collect()
    assert(s.length == 1 && s(0).getString(1) == "click" && s(0).getLong(4) == 11L)
  }

  test("untouched keys pass through the apply unchanged") {
    val changes = Cdc.asChangelog(log)
    val snap = Cdc.cdcBuild(changes.filter($"ts" < ts("2024-01-04 00:00:00")))
    val batch = log.filter($"user_id" === 3L && $"ts" >= ts("2024-01-04 00:00:00"))
    val merged = Cdc.cdcApply(snap, batch)
    val before = snap.filter($"user_id" =!= 3L).orderBy("user_id").collect().toSeq
    val after = merged.filter($"user_id" =!= 3L).orderBy("user_id").collect().toSeq
    assert(before == after)
    assert(merged.filter($"user_id" === 3L).collect()(0).getString(1) == "purchase")
  }

  test("fixture queries agree: apply over the cutoff equals the rebuild") {
    val dir = "/root/testdata/sf0.001"
    val a = Cdc.qCdcBuild(spark, dir).collect().toSeq
    val b = Cdc.qCdcApply(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("streaming CDC apply maintains state across restarts, idempotently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("cdc-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-ckpt").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val all = log.collect().toSeq

    val src = MemoryStream[(Long, Timestamp, Long, String, Double)]
    src.addData(all.take(5).map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getString(3), r.getDouble(4))): _*)
    StreamingOps.cdcApplyStream(src.toDF().toDF(cols: _*), stateDir, ckpt)
      .awaitTermination()
    // restart with the remaining changes — a new run, same checkpoint
    val src2 = MemoryStream[(Long, Timestamp, Long, String, Double)]
    src2.addData(all.drop(5).map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getString(3), r.getDouble(4))): _*)
    StreamingOps.cdcApplyStream(src2.toDF().toDF(cols: _*), stateDir,
      java.nio.file.Files.createTempDirectory("cdc-ckpt2").toString)
      .awaitTermination()

    val streamed = StreamingOps.cdcCurrentState(spark, stateDir)
      .orderBy("user_id").collect().toSeq
    val rebuilt = Cdc.cdcBuild(Cdc.asChangelog(log)).orderBy("user_id")
      .collect().toSeq
    assert(streamed == rebuilt)

    // version retention: the two runs above left >= 2 version dirs; a
    // third tiny batch makes it >= 3, then retain(2) must drop the old
    // ones, keep LATEST readable, and leave the state bit-identical
    val src3 = MemoryStream[(Long, Timestamp, Long, String, Double)]
    src3.addData(all.take(1).map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getString(3), r.getDouble(4))): _*)
    StreamingOps.cdcApplyStream(src3.toDF().toDF(cols: _*), stateDir,
      java.nio.file.Files.createTempDirectory("cdc-ckpt3").toString)
      .awaitTermination()
    def versionDirs(): Seq[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(stateDir))
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.matches("v\\d+")).sorted.toSeq
      finally s.close()
    }
    assert(versionDirs().size >= 3)
    val dropped = StreamingOps.cdcRetainVersions(stateDir, keep = 2)
    assert(dropped.nonEmpty)
    val remaining = versionDirs()
    assert(remaining.size == 2)
    assert(dropped.intersect(remaining).isEmpty)
    val latest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(stateDir, "LATEST")).trim
    assert(remaining.contains(latest), "retention dropped the LATEST target")
    assert(StreamingOps.cdcCurrentState(spark, stateDir)
      .orderBy("user_id").collect().toSeq == streamed)
  }
}
