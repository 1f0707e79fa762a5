package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Forget}

/** VERDICT r12 items 2+7: erasure propagated into the content-embedding
  * artifacts — packed sequences (manifest-targeted in-pack repack),
  * JSONL export shards, JDBC Gold tables, and the streaming CDC state
  * table with its version history. */
class ErasureTargetsSpec extends SparkSpecBase {
  import spark.implicits._

  private def filesUnder(dir: String): Map[String, Long] = {
    val s = Files.walk(Paths.get(dir))
    try s.filter(p => {
      val n = p.getFileName.toString
      Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_")
    }).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    finally s.close()
  }

  test("packed repack: subjects gone, same-pack survivors close up, other packs untouched") {
    val docs = Tables.documents(spark, sf).limit(400)
    val dir = Files.createTempDirectory("graft-packspec").toString
    Curation.writePacked(docs, capacity = 2048, nShards = 4, dir,
      nFiles = 8)
    val before = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // subject: a doc that has a LATER doc in the same (shard, pack)
    val byPack = before.values.groupBy(r => (r.getInt(1), r.getLong(4)))
      .filter(_._2.size >= 2)
    assert(byPack.nonEmpty, "fixture has no multi-doc pack — vacuous")
    val packDocs = byPack.head._2.toSeq.sortBy(_.getLong(0))
    val subject = packDocs.head.getLong(0)
    val follower = packDocs(1)
    val subjTokens = packDocs.head.getInt(2).toLong
    val filesBefore = filesUnder(dir)
    val audit = Forget.forgetPacked(spark, dir, Seq(subject).toDF("doc_id"))
      .collect()
    assert(audit.map(_.getLong(1)).sum == 1L, "exactly one row removed")
    val after = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!after.contains(subject))
    // same-pack follower closed up by the subject's token mass, pack
    // unchanged
    val f2 = after(follower.getLong(0))
    assert(f2.getLong(4) == follower.getLong(4), "pack_id must not move")
    assert(f2.getLong(5) == follower.getLong(5) - subjTokens,
      s"offset must close by $subjTokens")
    assert(f2.getLong(3) == follower.getLong(3) - subjTokens)
    // docs in other packs: bit-identical rows
    after.values.filter(r =>
      (r.getInt(1), r.getLong(4)) != (packDocs.head.getInt(1),
        packDocs.head.getLong(4)))
      .foreach(r => assert(r == before(r.getLong(0)),
        s"row ${r.getLong(0)} outside the affected pack changed"))
    // file pruning: unaffected files untouched on disk
    val affectedFiles = audit.map(_.getString(0)).toSet
    filesUnder(dir).foreach { case (f, m) =>
      if (!affectedFiles.contains(Paths.get(f).getFileName.toString))
        assert(filesBefore(f) == m, s"unaffected file rewritten: $f")
    }
    // idempotent
    assert(Forget.forgetPacked(spark, dir,
      Seq(subject).toDF("doc_id")).count() == 0)
  }

  test("whole-dir packed sweep preserves pack-per-file; a following per-file sweep stays exact") {
    // ADVICE r13 (medium): subjects in a MAJORITY of files route the
    // sweep through the whole-dir rewrite; if that write scattered
    // packs across files, the NEXT per-file sweep would shift only the
    // survivors co-located with a subject row — silent stale offsets.
    val docs = Tables.documents(spark, sf).limit(400)
    val dir = Files.createTempDirectory("graft-packwhole").toString
    Curation.writePacked(docs, capacity = 2048, nShards = 4, dir,
      nFiles = 8)
    val ids = spark.read.parquet(dir).select("doc_id")
      .collect().map(_.getLong(0))
    // every 3rd doc: scattered subjects guarantee >half the files hit
    val subjects = ids.filter(_ % 3 == 0)
    Forget.forgetPacked(spark, dir, subjects.toSeq.toDF("doc_id"))
    // the pack-per-file contract must survive the whole-dir rewrite
    val straddling = spark.read.parquet(dir)
      .select(col("shard"), col("pack_id"), input_file_name().as("f"))
      .distinct().groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(straddling == 0,
      "a (shard, pack_id) pack straddles files after the whole-dir sweep")
    // second, SURGICAL sweep: one subject with a same-pack follower;
    // compare the whole table against the exact in-memory closure
    val mid = spark.read.parquet(dir).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val multi = mid.groupBy(r => (r._2, r._5)).filter(_._2.size >= 2)
    assert(multi.nonEmpty, "fixture has no multi-doc pack — vacuous")
    val packRows = multi.head._2.sortBy(_._1)
    val subj2 = packRows.head
    Forget.forgetPacked(spark, dir, Seq(subj2._1).toDF("doc_id"))
    val after = spark.read.parquet(dir).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val expected = mid.filter(_._1 != subj2._1).map { r =>
      if ((r._2, r._5) == (subj2._2, subj2._5) && r._1 > subj2._1)
        r.copy(_4 = r._4 - subj2._3, _6 = r._6 - subj2._3)
      else r
    }.toSet
    assert(after == expected,
      "per-file closure after a whole-dir sweep drifted — stale offsets")
  }

  test("jsonl erasure: subject lines gone, survivor lines byte-identical, untouched shards untouched") {
    val docs = Tables.documents(spark, sf).limit(300)
      .select(col("doc_id"), col("lang"), col("text"))
    val dir = Files.createTempDirectory("graft-jlspec").toString
    graft.sinks.Jsonl.exportCorpus(docs, dir, shards = 5)
    val before = spark.read.text(dir)
      .withColumn("f", input_file_name())
      .collect().map(r => (r.getString(0), r.getString(1)))
    val subjects = docs.limit(3).select(col("doc_id"))
    val subjIds = subjects.collect().map(_.getLong(0)).toSet
    val filesBefore = filesUnder(dir)
    val audit = Forget.forgetJsonl(spark, dir, "$.doc_id", subjects)
      .collect()
    assert(audit.map(_.getLong(1)).sum == subjIds.size.toLong)
    val after = spark.read.text(dir).collect().map(_.getString(0)).toSet
    // zero subject bytes in a re-read
    subjIds.foreach(id => assert(
      !after.exists(_.contains("\"doc_id\":" + id + ",")),
      s"subject $id still present"))
    // survivors byte-identical (line-level, no re-serialization drift)
    val expected = before.map(_._1).filter(l =>
      !subjIds.exists(id => l.contains("\"doc_id\":" + id + ","))).toSet
    assert(after == expected)
    // untouched shards untouched
    val affectedFiles = audit.map(_.getString(0)).toSet
    filesUnder(dir).foreach { case (f, m) =>
      if (!affectedFiles.contains(Paths.get(f).getFileName.toString))
        assert(filesBefore(f) == m, s"unaffected shard rewritten: $f")
    }
    // the export still parses through the schema contract
    val back = graft.sinks.Jsonl.readBack(spark, dir, docs.schema)
    assert(back.count() == docs.count() - subjIds.size)
    assert(back.filter(col("doc_id").isin(subjIds.toSeq.map(Long.box): _*))
      .count() == 0)
  }

  test("jdbc erasure: subject-keyed batched delete, idempotent") {
    val url = s"jdbc:derby:memory:forget${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val gold = Tables.events(spark, sf).limit(500)
      .select(col("event_id"), col("user_id"), col("event_type"))
    gold.write.mode("overwrite").jdbc(url, "gold_events", props)
    val total = gold.count()
    val subjects = gold.select(col("user_id")).distinct().limit(3)
    val subjRows = gold.join(subjects, Seq("user_id"), "left_semi").count()
    assert(subjRows > 0)
    val removed = Forget.forgetJdbc(url, props, "gold_events", "user_id",
      subjects)
    assert(removed == subjRows, s"deleted $removed, expected $subjRows")
    val back = spark.read.jdbc(url, "gold_events", props)
    assert(back.count() == total - subjRows)
    assert(back.join(subjects, Seq("user_id"), "left_semi").count() == 0,
      "subject rows survive in the gold table")
    // idempotent
    assert(Forget.forgetJdbc(url, props, "gold_events", "user_id",
      subjects) == 0L)
  }

  test("cdc state erasure: swept snapshot, zero history, next batch stays clean") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = Files.createTempDirectory("cdc-forget").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    def batch(rows: Seq[(Long, Long, String)]): Unit = {
      val src = MemoryStream[(Long, Timestamp, Long, String, Double)]
      src.addData(rows.zipWithIndex.map { case ((eid, uid, t), i) =>
        (eid, new Timestamp(1700000000000L + i * 1000L), uid, t, 1.0)
      }: _*)
      StreamingOps.cdcApplyStream(src.toDF().toDF(cols: _*), stateDir,
        Files.createTempDirectory("cdc-forget-ckpt").toString)
        .awaitTermination()
    }
    // two batches → two history versions, subjects are user 7's keys
    batch(Seq((1L, 7L, "update"), (2L, 8L, "update")))
    batch(Seq((3L, 7L, "update"), (4L, 9L, "update")))
    // the state table is keyed by user: one current row per subject
    assert(StreamingOps.cdcCurrentState(spark, stateDir).count() == 3L)
    val (removed, kept, droppedVersions) =
      Forget.forgetCdcState(spark, stateDir, "user_id",
        Seq(7L).toDF("user_id"))
    assert(removed == 1L && kept == 2L)
    assert(droppedVersions >= 2L, "history versions must be dropped")
    // zero subject rows in the current state AND in any surviving file
    assert(StreamingOps.cdcCurrentState(spark, stateDir)
      .filter(col("user_id") === 7L).count() == 0)
    val vDirs = {
      val s = Files.list(Paths.get(stateDir))
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => p.getFileName.toString.matches("v\\d+")).toSeq
      finally s.close()
    }
    assert(vDirs.size == 1, s"history must be gone, saw $vDirs")
    vDirs.foreach { v =>
      assert(spark.read.parquet(v.toString)
        .filter(col("user_id") === 7L).count() == 0)
    }
    // one more micro-batch merges INTO the swept snapshot
    batch(Seq((5L, 10L, "update")))
    val finalState = StreamingOps.cdcCurrentState(spark, stateDir)
    assert(finalState.filter(col("user_id") === 7L).count() == 0,
      "subject resurrected by the next micro-batch")
    assert(finalState.count() == 3L)
  }
}
