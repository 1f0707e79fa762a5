package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Structured Streaming semantics driven through the file source +
  * memory sink (the offline stand-in for the Kafka leg, SURVEY §7.3). */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(): String = {
    val d = Files.createTempDirectory("graft-stream").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$d/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d
  }

  private def streamEvents(dir: String) = Tables.eventsStream(spark, dir)

  test("stream definition survives a corrupt landing file (schema fallback)") {
    // a half-written producer file throws SparkException (not
    // AnalysisException) from the inference footer read; the stream must
    // still define, degrading to the declared fallback schema
    val d = Files.createTempDirectory("graft-corrupt").toString
    Files.write(Paths.get(s"$d/half_written.parquet"),
      "PAR1 this is not a parquet footer".getBytes("UTF-8"))
    val stream = Tables.eventsStream(spark, d)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSet == Tables.eventsRawSchema.fieldNames.toSet)
  }

  test("watermarked hourly window agg matches the batch groupBy") {
    val dir = eventsDir()
    val q = StreamingOps.hourlyAggStream(streamEvents(dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("hourly_out")
    val batch = Tables.events(spark, sf)
      .groupBy(window($"ts", "1 hour"), $"event_type").count()
    assert(streamed.count() == batch.count())
    val total = streamed.agg(sum($"record_count")).head().getLong(0)
    assert(total == 1000)
  }

  test("dedup-gate state erasure SLA: subject keys self-expire within one watermark horizon") {
    // VERDICT r13 item 7: the watermarked dedup store is the ONE state
    // holder no external sweep can rewrite (opaque checkpointed state),
    // so its erasure story is retention — a subject's key must be GONE
    // from the recovered state store once event time passes the
    // watermark horizon. This pins that SLA by reading the checkpoint
    // back through the state data source after the horizon passes.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = Files.createTempDirectory("graft-dedup-sla").toString
    val src = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val q = StreamingOps.dedupStream(
        src.toDS().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("memory").queryName("dedup_sla").start()
    def ts(h: Long) = new java.sql.Timestamp(3600000L * h)
    val subjects = (1L to 5L).toSet
    src.addData(subjects.toSeq.map(u => (u, ts(0), u, "view", 1.0)))
    q.processAllAvailable()
    // two later waves 10h past the subjects (horizon = 2h): the first
    // advances the watermark, the second runs WITH it and commits the
    // eviction (watermarks apply from the batch after they're computed)
    src.addData(Seq((100L, ts(10), 100L, "view", 1.0)))
    q.processAllAvailable()
    src.addData(Seq((101L, ts(10), 101L, "view", 1.0)))
    q.processAllAvailable()
    q.stop()
    // the RECOVERED store: read the checkpoint back, not the live query
    val keyDf = spark.read.format("statestore").load(cp).select("key.*")
    assert(keyDf.columns.contains("user_id"), keyDf.columns.mkString(","))
    val keys = keyDf.select(col("user_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(keys.intersect(subjects).isEmpty,
      s"subject keys survive past the watermark horizon: $keys")
    // non-vacuous: in-horizon keys ARE retained in the same store
    assert(keys.contains(100L) && keys.contains(101L),
      s"recent keys missing — state read is broken: $keys")
  }

  test("streaming dedup within watermark drops replayed rows") {
    val dir = eventsDir()
    // replay: second copy of the same file
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events_replay.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingOps.dedupStream(streamEvents(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_out").count() == 1000,
      "2000 input rows (replayed) must dedup to 1000")
  }

  test("streaming dup-rate: closed days equal the batch monitor exactly") {
    val dir = eventsDir()
    // replay one file copy so duplicates actually exist in the stream
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events_replay.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingOps.dupRateStream(streamEvents(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("duprate_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("duprate_out").collect()
      .map(r => r.getDate(0).toString -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("distinct_tuples"), r.getAs[Long]("dup_rows"),
        r.getAs[Long]("dup_rate_milli"))).toMap
    // append emits only watermark-closed days; the doubled feed means
    // every emitted day must read exactly 2x rows, 500‰
    assert(streamed.nonEmpty, "no closed day emitted")
    val batch = graft.operators.Diagnostics.dupRateDaily(
      Tables.events(spark, sf).unionAll(Tables.events(spark, sf)))
      .collect().map(r => r.getDate(0).toString -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("distinct_tuples"), r.getAs[Long]("dup_rows"),
        r.getAs[Long]("dup_rate_milli"))).toMap
    streamed.foreach { case (day, row) =>
      assert(batch(day) == row, s"day $day diverges from the batch twin")
    }
    // all but the watermark-open tail must have closed
    assert(streamed.size >= batch.size - 2,
      s"${streamed.size} closed of ${batch.size} days")
  }

  test("built-in session_window sessionization matches the lag-based batch twin") {
    // fixture has no exact-gap boundary pairs (where the two forms
    // legitimately differ; see sessionizeWindow scaladoc)
    val viaWindow = StreamingOps.sessionizeWindow(Tables.events(spark, sf))
      .orderBy($"user_id", $"session_start")
      .collect().toSeq
    val viaLag = StreamingOps.sessionizeBatch(Tables.events(spark, sf))
      .select($"user_id", $"session_start", $"session_end", $"events")
      .orderBy($"user_id", $"session_start")
      .collect().toSeq
    assert(viaWindow.nonEmpty && viaWindow == viaLag)
  }

  test("stream-static enrichment joins each micro-batch against the dim, broadcast") {
    val dir = eventsDir()
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue")).toDF("event_type", "category")
    val q = StreamingOps.enrichStream(streamEvents(dir), dim, "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("enrich_out")
    assert(out.count() == 1000, "left join preserves every stream row")
    val batch = Tables.events(spark, sf).join(dim, Seq("event_type"), "left")
    assert(out.filter($"category".isNull).count() ==
      batch.filter($"category".isNull).count(), "unmatched rows carry null")
    assert(out.filter($"category" === "revenue").count() ==
      batch.filter($"category" === "revenue").count())
  }

  test("stateful sessionize emits the sessions its batch twin closes") {
    val dir = eventsDir()
    val q = StreamingOps.sessionize(
        streamEvents(dir).as[StreamingOps.Event], gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sessions_out")
      .select("user_id", "session_start", "session_end", "events")
    // a single-batch stream emits: every session closed by a later event,
    // plus last-sessions whose event-time timeout (end+gap) falls before
    // the final watermark (max ts − 2h)
    val events = Tables.events(spark, sf)
    val cutoffMs = events.agg(max($"ts")).head().getTimestamp(0).getTime - 2 * 3600 * 1000L
    val batch = StreamingOps.sessionizeBatch(events, 30)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_start".desc)
    val expected = batch.withColumn("rn", row_number().over(w))
      .filter($"rn" > 1
        || ($"session_end".cast("long") * 1000L + 30 * 60000L) < cutoffMs)
      .drop("rn")
      .select("user_id", "session_start", "session_end", "events")
    assert(streamed.count() == expected.count(),
      s"streamed ${streamed.count()} vs expected ${expected.count()}")
    assert(streamed.except(expected).isEmpty && expected.except(streamed).isEmpty)
  }

  test("streaming gold load is exactly-once under replay (foreachBatch + anti-join)") {
    val dir = eventsDir()
    val url = s"jdbc:derby:memory:sgold${System.nanoTime()};create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      """CREATE TABLE gold_events ("event_id" BIGINT, "ts" TIMESTAMP,
        |"user_id" BIGINT, "event_type" VARCHAR(32), "value" DOUBLE,
        |"props" VARCHAR(256))""".stripMargin)
    c.close()
    val ckpt = java.nio.file.Files.createTempDirectory("sgold-ckpt").toString
    def runOnce(): Unit = {
      val q = StreamingOps.streamToGold(
        streamEvents(dir), url, "gold_events",
        Seq("user_id", "ts"), ckpt)
      q.awaitTermination()
    }
    runOnce()
    val n1 = graft.sinks.JdbcSink.readTable(spark, url, "gold_events").count()
    assert(n1 == 1000)
    // replay the same file under a FRESH checkpoint (simulated source
    // re-delivery): the anti-join must load zero new rows
    val ckpt2 = java.nio.file.Files.createTempDirectory("sgold-ckpt2").toString
    val q2 = StreamingOps.streamToGold(
      streamEvents(dir), url, "gold_events", Seq("user_id", "ts"), ckpt2)
    q2.awaitTermination()
    assert(graft.sinks.JdbcSink.readTable(spark, url, "gold_events").count() == 1000)
  }

  test("typed Dataset boundary round-trips the cleaned weather grain") {
    import graft.operators.WeatherSilver
    val bronze = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("Paris", "FR", "2024-01-01T12:00:00", 20.0, 19.0,
          18.0, 22.0, 1013: Integer, 65: Integer, 10000: Integer, 5.5, 180: Integer,
          20: Integer, "Clear", "clear sky", "2024-01-01T07:00:00",
          "2024-01-01T17:00:00", "2024-01-01T12:00:00", 0: Integer,
          123L: java.lang.Long, "2024-01-01T12:00:00"))),
      WeatherSilver.bronzeSchema)
    val ds = WeatherSilver.toDataset(WeatherSilver.clean(bronze))
    val rec = ds.head()
    assert(rec.city == "Paris" && rec.temperature == 20.0)
    assert(rec.data_quality_score == 100 && rec.humidity.contains(65))
    // typed groupByKey works over the Dataset
    val byCountry = ds.groupByKey(_.country).count().collect().toMap
    assert(byCountry("FR") == 1L)
  }

  test("kafka option builders carry the reference's delivery guarantees") {
    val src = graft.sources.Bronze.kafkaSourceOptions("broker:9092", "weather-data")
    assert(src("startingOffsets") == "earliest" && src("subscribe") == "weather-data")
    val sink = graft.sources.Bronze.kafkaSinkOptions("broker:9092", "weather-data")
    assert(sink("kafka.acks") == "all" && sink("kafka.compression.type") == "gzip"
      && sink("kafka.max.in.flight.requests.per.connection") == "1")
  }

  test("kafka json round trip: toKafkaJson → fromKafkaJson preserves records") {
    val recs = Seq((1L, "Paris", 20.5), (2L, "London", 18.0))
      .toDF("id", "city", "temperature")
    val wire = graft.sources.Bronze.toKafkaJson(recs, "city")
      .withColumn("partition", lit(0)).withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", current_timestamp())
    val back = graft.sources.Bronze.fromKafkaJson(wire, recs.schema)
    assert(back.select("id", "city", "temperature").orderBy("id").collect().toSeq ==
      recs.orderBy("id").collect().toSeq)
    assert(back.columns.contains("_kafka_offset"))
  }

  test("stream-stream interval join emits exactly the batch range-join pairs") {
    val dir = eventsDir()
    val q = StreamingOps.followupsStream(streamEvents(dir), streamEvents(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("followups_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("followups_out")
      .select("event_a", "event_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, sf)
    val batch = graft.operators.Ranged.rangeJoinBinned(
        ev.select($"event_id".as("event_a"), $"user_id", $"ts".as("ts_a")),
        ev.select($"event_id".as("event_b"), $"user_id", $"ts".as("ts_b")),
        "user_id", "ts_a", "ts_b", 1800L)
      .select("event_a", "event_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream missed ${batch -- streamed}, extra ${streamed -- batch}")
  }

  test("left-outer interval join emits unmatched events only after watermark eviction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val src = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val events = src.toDF.toDF("event_id", "user_id", "ts")
    val q = StreamingOps.followupsStreamOuter(events, events)
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_out").start()
    def out() = spark.table("outer_out")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // batch 1: a matched pair for user 7, a lone event for user 8
    src.addData((1L, 7L, t("2024-01-01 10:00:00")), (2L, 7L, t("2024-01-01 10:10:00")),
      (3L, 8L, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    assert(out().contains((1L, 2L)), "inner match must emit immediately")
    assert(!out().exists(_._2 == -1L), "no outer row before watermark passes")
    // batch 2: far-future event advances max event time; batch 3 runs with
    // the updated watermark (watermark for batch N comes from batch N-1)
    // and evicts user 8's lone event and user 7's tail event as unmatched
    src.addData((4L, 9L, t("2024-01-01 23:00:00")))
    q.processAllAvailable()
    src.addData((5L, 9L, t("2024-01-01 23:00:01")))
    q.processAllAvailable()
    assert(out().contains((3L, -1L)), s"lone event must outer-emit after eviction: ${out()}")
    assert(out().contains((2L, -1L)), "tail event with no follow-up must outer-emit")
    assert(!out().contains((4L, -1L)), "event still inside the watermark horizon must stay pending")
    q.stop()
  }

  test("curation funnel + PII scrub run unchanged on a document stream") {
    // the whole curation map-only family is stateless, so the same
    // Column expressions drive readStream → writeStream with no
    // batch/stream code fork — the property this test pins
    val d = Files.createTempDirectory("graft-docs-stream").toString
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(s"$d/documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = Tables.documents(spark, sf)
    val streamDocs = spark.readStream.schema(batchDocs.schema).parquet(d)
    val (emails, _, _, clean) = graft.operators.Curation.scrubPii(col("text"))
    val q = graft.operators.Curation.filterFunnel(streamDocs)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("funnel_out")
      .select($"doc_id", $"keep", $"drop_reason")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSet
    val batch = graft.operators.Curation.filterFunnel(batchDocs)
      .select($"doc_id", $"keep", $"drop_reason")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSet
    assert(streamed == batch, "stream and batch funnel verdicts must agree")
    val q2 = streamDocs.select($"doc_id", emails.as("n"), clean.as("c"))
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_out")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("scrub_out").count() == batchDocs.count())
  }

  test("streaming dedup gate classifies micro-batches exactly like the batch incremental dedup") {
    import graft.operators.{IncrementalDedup, TextAnalysis}
    val tagged = TextAnalysis.withSplit(Tables.documents(spark, sf))
    val corpus = tagged.filter($"split" === "train").select("doc_id", "text")
    val incoming = tagged.filter($"split" =!= "train").select("doc_id", "text")
    // 3 files + maxFilesPerTrigger=1 → 3 micro-batches: per-doc status
    // depends only on the static corpus, so batch boundaries must not
    // change any verdict
    val d = Files.createTempDirectory("graft-gate-in").toString
    incoming.repartition(3).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(d)
    val cp = Files.createTempDirectory("graft-gate-cp").toString
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var batches = 0
    val q = StreamingOps.dedupGateStream(stream, corpus, cp) { (res, _) =>
      got ++= res.collect().map(r => (r.getLong(0), r.getString(1)))
      batches += 1
    }
    q.awaitTermination()
    assert(batches >= 3, s"expected ≥3 micro-batches, saw $batches")
    val expected = IncrementalDedup.incrementalDedup(corpus, incoming)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.size == expected.size, "every incoming doc classified exactly once")
    assert(got.toSet == expected, "stream and batch classifications must agree")
    // replay safety: the classification stream is fully checkpointed —
    // restarting over the same input re-classifies nothing
    var replayed = 0
    val q2 = StreamingOps.dedupGateStream(
      spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1).parquet(d), corpus, cp) { (res, _) =>
      replayed += res.count().toInt
    }
    q2.awaitTermination()
    assert(replayed == 0, s"checkpointed restart re-classified $replayed docs")
  }

  test("streaming as-of enriches micro-batches exactly like the batch as-of join") {
    import graft.operators.AsOf
    // at sf0.001 every event user has a prior order, so plant one event
    // for a user with no orders — the left join's null path must flow
    // through the stream too
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .unionByName(spark.sql(
        """SELECT CAST(999999 AS BIGINT) AS event_id,
          |  TIMESTAMP '1995-01-01 00:00:00' AS ts,
          |  CAST(-1 AS BIGINT) AS user_id,
          |  'view' AS event_type, CAST(1.0 AS DOUBLE) AS value""".stripMargin))
    val ord = Tables.orders(spark, sf)
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(max_by($"o_orderkey", $"o_orderkey").as("o_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
    // 3 files + maxFilesPerTrigger=1 → ≥3 micro-batches: each event's
    // match depends only on the settled right side, so batch boundaries
    // must not change any enrichment
    val d = Files.createTempDirectory("graft-asof-in").toString
    ev.repartition(3).write.mode("overwrite").parquet(d)
    val cp = Files.createTempDirectory("graft-asof-cp").toString
    def row(r: org.apache.spark.sql.Row): (Long, Option[Long], Option[Double]) = (
      r.getLong(r.fieldIndex("event_id")),
      if (r.isNullAt(r.fieldIndex("o_orderkey"))) None
      else Some(r.getLong(r.fieldIndex("o_orderkey"))),
      if (r.isNullAt(r.fieldIndex("o_totalprice"))) None
      else Some(r.getDouble(r.fieldIndex("o_totalprice"))))
    val got = scala.collection.mutable.ArrayBuffer[(Long, Option[Long], Option[Double])]()
    var batches = 0
    val q = StreamingOps.asofStream(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d),
      ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), cp) { (res, _) =>
      got ++= res.collect().map(row); batches += 1
    }
    q.awaitTermination()
    assert(batches >= 3, s"expected ≥3 micro-batches, saw $batches")
    val expected = AsOf.asofJoin(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice")).collect().map(row)
    assert(got.size == expected.length, "every event enriched exactly once")
    assert(got.toSet == expected.toSet,
      "stream and batch as-of enrichments must agree")
    // some events must actually match an order (the fixture isn't
    // vacuously all-null) and some must not (the left join is real)
    assert(expected.exists(_._2.isDefined) && expected.exists(_._2.isEmpty))
    // replay safety: checkpointed restart over the same input re-enriches
    // nothing
    var replayed = 0
    val q2 = StreamingOps.asofStream(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d),
      ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), cp) { (res, _) =>
      replayed += res.count().toInt
    }
    q2.awaitTermination()
    assert(replayed == 0, s"checkpointed restart re-enriched $replayed events")
  }

  test("streaming bottom-k sample converges to the batch exact-k sample, any batching") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.TextFns
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = graft.operators.Sampling.SampleK
    val hashed = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        TextFns.md5u56($"doc_id".cast("string")).as("h"))
      .as[StreamingOps.HashedDoc].collect()
    // adversarial slicing: REVERSE hash order, so every batch improves
    // (replaces members of) the running sample — the merge path is
    // exercised on every element, not just the first k
    val batches = hashed.sortBy(-_.h).grouped(math.max(1, hashed.length / 3 + 1)).toSeq
    val src = MemoryStream[StreamingOps.HashedDoc]
    val q = StreamingOps.bottomKSampleStream(src.toDS(), k)
      .writeStream.outputMode("update")
      .format("memory").queryName("bk_out").start()
    batches.foreach { b => src.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val snaps = spark.table("bk_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    val finalPerSource = snaps.groupBy(_._1)
      .map { case (s, v) => s -> v.maxBy(_._2)._3.toSet }
    val expected = graft.operators.Sampling
      .exactKPerGroup(Tables.documents(spark, sf), k)
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).toSet }
    assert(finalPerSource == expected,
      "streaming bottom-k state must converge to the batch sample")
    // and mid-stream snapshots never exceed k
    snaps.foreach { case (s, _, m) => assert(m.size <= k, s"$s over k") }
  }

  test("streaming quota admission caps each source across batches like the batch window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cap = 3
    val all = Tables.documents(spark, sf).select($"doc_id", $"source")
      .as[(Long, String)].collect().sortBy(_._1)
    val src = MemoryStream[(Long, String)]
    val ds = src.toDS().map { case (id, s) => StreamingOps.Doc(id, s) }
    val q = StreamingOps.quotaAdmitStream(ds, cap)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    // feed in 3 doc_id-ordered micro-batches so arrival order is doc_id
    // order — then the batch twin is a plain rank window
    all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
      src.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("quota_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val expected = Tables.documents(spark, sf)
      .withColumn("rank_in_source", row_number().over(w))
      .filter($"rank_in_source" <= cap)
      .select($"doc_id", $"source", $"rank_in_source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(streamed == expected,
      s"stream admitted ${streamed.size}, batch twin ${expected.size}")
    // quota is permanent: replaying docs of a source whose quota is
    // spent admits nothing (sources with fewer than cap docs still have
    // room, so replay only the saturated ones)
    val saturated = all.groupBy(_._2).filter(_._2.length >= cap).keySet
    val src2 = MemoryStream[(Long, String)]
    val q2 = StreamingOps.quotaAdmitStream(
        src2.toDS().map { case (id, s) => StreamingOps.Doc(id, s) }, cap)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out2").start()
    src2.addData(all.toSeq)
    q2.processAllAvailable()
    val afterFirst = spark.table("quota_out2").count()
    src2.addData(all.filter(d => saturated.contains(d._2)).toSeq)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.table("quota_out2").count() == afterFirst,
      "spent quota re-admitted replayed docs")
  }

  test("stateful dedup runs on the RocksDB state store and matches HDFS-backed state") {
    // the 100 TB state backend: HDFS-backed state lives on the executor
    // heap and dies by OOM at large key cardinality; RocksDB spills to
    // local disk. Same query, both providers, identical results.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .limit(400).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val dup = rows ++ rows.take(100) // force the dedup state to matter
    def runWith(provider: Option[String], name: String): Set[Long] = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val src = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
        val q = StreamingOps.dedupStream(
            src.toDS().toDF("event_id", "ts", "user_id", "event_type", "value"))
          .writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        dup.grouped(200).foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
        q.stop()
        spark.table(name).select($"event_id").collect().map(_.getLong(0)).toSet
      } finally {
        provider.foreach(_ => prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        })
      }
    }
    val rocks = runWith(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "dedup_rocks")
    val hdfs = runWith(None, "dedup_hdfs")
    val expected = rows.map(r => (r._3, r._2)).distinct.length
    assert(rocks == hdfs && rocks.size == expected,
      s"rocksdb ${rocks.size} vs hdfs ${hdfs.size} vs expected $expected")
  }

  test("streaming Misra-Gries equals exact counts when nothing evicts, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val words = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.words($"text")).as("w"))
      .as[String].collect().toSeq
    val src = MemoryStream[String]
    val q = StreamingOps.heavyHittersStream(src.toDS(), shards = 4,
        summarySize = 4096)
      .writeStream.outputMode("update")
      .format("memory").queryName("mg_out").start()
    words.grouped(words.length / 3 + 1).foreach { chunk =>
      src.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    // live summary = latest stamp per shard (computed driver-side: the
    // memory sink's view cannot self-join)
    val rows = spark.table("mg_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val latest = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val live = rows.filter(r => r._4 == latest(r._1))
      .map(r => r._2 -> r._3).toMap
    // vocabulary < summarySize → no decrement ever ran → exact counts
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(live == exact, s"live ${live.size} terms vs exact ${exact.size}")
    // and the batch operator's top-20 is contained in the live summary
    val top = graft.operators.TextAnalysis.qHeavyHitters(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(top.subsetOf(live.keySet))
  }

  test("streaming Misra-Gries under eviction keeps the heavy term within the MG bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 40×a + 4 singletons through a 2-entry summary on one shard:
    // eviction must fire, yet a's estimate stays within seen/(m+1)
    val stream = (Seq.fill(40)("a") ++ Seq("b", "c", "d", "e")).sorted
    val src = MemoryStream[String]
    val q = StreamingOps.heavyHittersStream(src.toDS(), shards = 1,
        summarySize = 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("mg_small").start()
    stream.grouped(11).foreach { chunk => src.addData(chunk); q.processAllAvailable() }
    q.stop()
    val out = spark.table("mg_small")
    val seen = out.agg(max($"shard_seen")).head().getLong(0)
    assert(seen == 44)
    val live = out.filter($"shard_seen" === seen)
      .select($"term", $"est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(live.contains("a"), s"heavy term evicted: $live")
    assert(live("a") <= 40 && live("a") >= 40 - seen / 3,
      s"estimate ${live("a")} outside the MG bound")
    assert(live.size <= 2, "summary exceeded its bound")
  }

  test("multimodal partition-batch decode matches the expression stub shape") {
    val media = graft.operators.Multimodal.asMedia(Tables.documents(spark, sf))
      .as[graft.operators.Multimodal.Media]
    val feats = graft.operators.Multimodal.decodePartitions(media)
    val rows = feats.limit(5).collect()
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.features.forall(f => f >= 0.0 && f < 1.0)))
    // deterministic: same payload → same features
    val again = graft.operators.Multimodal.decodePartitions(media).limit(5).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("multimodal frame-sample fans media rows out to bounded frame rows") {
    import graft.operators.Multimodal
    val media = Multimodal.asMedia(Tables.documents(spark, sf))
      .as[Multimodal.Media]
    val frames = Multimodal.sampleFramePartitions(media)
    val perDoc = frames.groupBy($"doc_id").count()
      .join(media.select($"doc_id", length($"payload").as("len")), "doc_id")
    // one frame per stride-sized chunk of payload, at least one per doc
    assert(perDoc.filter($"count" =!= greatest(lit(1), ceil($"len" / 256))).count() == 0)
    val f = frames.filter($"doc_id" === 0).orderBy($"frame_idx").collect()
    assert(f.nonEmpty && f.head.frame_idx == 0 && f.forall(_.size_bytes <= 64))
    // resize cap bounds the payload column
    val resized = Multimodal.asMedia(Tables.documents(spark, sf))
      .select(length(Multimodal.resizeStubExpr($"payload", 100)).as("l"))
    assert(resized.agg(max($"l")).head().getInt(0) <= 100)
  }
}
