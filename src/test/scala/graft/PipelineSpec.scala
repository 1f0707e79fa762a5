package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sinks.JdbcSink

/** End-to-end pipeline run against a temp warehouse + embedded Derby as
  * the Gold store: exercises streaming bronze ingest with checkpointing,
  * the cached silver fan-out, the idempotent anti-join gold load, the
  * quality gate, and the run ledger. */
class PipelineSpec extends SparkSpecBase {

  private def freshWarehouse(): String = {
    val wh = Files.createTempDirectory("graft-wh").toString
    Files.createDirectories(Paths.get(s"$wh/landing"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$wh/landing/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    wh
  }

  test("pipeline runs end-to-end: ingest → silver → gold → gate → ledger") {
    val wh = freshWarehouse()
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val notified = new scala.collection.mutable.ArrayBuffer[Pipeline.Report]
    val cfg = Pipeline.Config(sf, wh, Some(url),
      notifier = new StageRunner.Notifier {
        override def onSuccess(r: Pipeline.Report): Unit = notified += r
      })

    val r1 = Pipeline.run(spark, cfg)
    assert(notified.toSeq == Seq(r1), "success notification carries the report")
    assert(r1.bronzeRows == 1000, s"bronze ${r1.bronzeRows}")
    assert(r1.silverRows > 900 && r1.silverRows < 1000) // range filter trims some
    assert(r1.goldRowsLoaded > 0)
    assert(r1.duplicateKeys == 0 && r1.criticalNulls == 0)
    assert(r1.gatePassed)

    // ledger recorded SUCCESS for each stage
    val log = new JdbcSink.PipelineLog(url)
    Seq("bronze_ingest", "silver", "gold_load").foreach { stage =>
      val st = log.statusOf(r1.executionId, stage)
      assert(st.exists(_._1 == "SUCCESS"), s"$stage ledger: $st")
    }

    // re-run over the same warehouse: checkpoint skips ingested files,
    // gold anti-join loads zero new rows (idempotence)
    val r2 = Pipeline.run(spark, cfg)
    assert(r2.goldRowsLoaded == 0, s"second run loaded ${r2.goldRowsLoaded}")
    assert(r2.gatePassed)

    // gold table holds exactly one copy
    val gold = JdbcSink.readTable(spark, url, "gold_events_daily")
    assert(gold.count() == r1.goldRowsLoaded)
  }

  test("date-scoped run prunes bronze partitions declaratively") {
    val wh = freshWarehouse()
    val cfg = Pipeline.Config(sf, wh, None,
      date = Some(java.time.LocalDate.of(2024, 1, 5)))
    val r = Pipeline.run(spark, cfg)
    assert(r.bronzeRows > 0 && r.bronzeRows < 100, s"one day ≈ 33 rows, got ${r.bronzeRows}")
    assert(r.gatePassed)
  }

  test("tolerant bronze read skips a corrupt file instead of failing the run") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toString
    Tables.events(spark, sf).limit(100).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    // a half-written producer file: parquet magic header, then garbage
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      ("PAR1" + "x" * 64).getBytes)
    val schema = spark.read.parquet(dir + "/" +
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-0")).head.getName).schema
    intercept[Exception] {
      spark.read.schema(schema).parquet(dir).count() // strict read must fail
    }
    val tolerant = graft.sources.Bronze.readBronzeTolerant(spark, dir, schema)
    assert(tolerant.count() == 100, "tolerant read must return the intact file's rows")
  }

  test("schema-evolved read merges an added column; old rows surface it as null") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    val ev = Tables.events(spark, sf)
    ev.limit(50).select(col("event_id"), col("user_id"))
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    ev.limit(30).select(col("event_id"), col("user_id"), lit("eu-west").as("region"))
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val merged = graft.sources.Bronze.readBronzeEvolved(spark, dir)
    assert(merged.columns.toSet == Set("event_id", "user_id", "region", "batch"))
    assert(merged.count() == 80)
    assert(merged.filter(col("region").isNull).count() == 50,
      "pre-evolution rows must carry null for the added column")
    assert(merged.filter(col("region") === "eu-west").count() == 30)
  }

  test("compaction collapses per-task file fragments, preserving content") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    // 12 fragments per partition directory (one per shuffle task)
    Tables.events(spark, sf).repartition(12)
      .write.mode("overwrite").partitionBy("event_type").parquet(in)
    def files(p: String) = {
      val fs = new java.io.File(p)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(fs).filter(_.getName.endsWith(".parquet"))
    }
    val before = files(in).size
    graft.sources.Bronze.compact(spark, in, out, Seq("event_type"))
    val after = files(out).size
    assert(before >= 5 * 12, s"fixture should fragment: $before files")
    assert(after < before / 4, s"compaction barely helped: $before -> $after")
    val a = spark.read.parquet(in).orderBy("event_id").collect().toSeq
    val b = spark.read.parquet(out).select(spark.read.parquet(in).columns.map(col).toIndexedSeq: _*)
      .orderBy("event_id").collect().toSeq
    assert(a == b, "compaction must not change content")
  }
}
