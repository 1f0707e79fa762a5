package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Bronze ingestion layer (reference: kafka_consumer_s3.py + the producer).
  *
  * The Kafka hop itself is expressed as configuration builders plus a
  * value-decoding projection: the connector jar isn't bundled in this
  * offline environment, so the stream tests drive the same code through
  * the file source (SURVEY §7.3). Checkpointed Structured Streaming
  * replaces the reference's manual offset commit: offsets live in the
  * checkpoint and the parquet sink is idempotent per micro-batch, giving
  * exactly-once into Bronze (vs the reference's at-least-once + dedup).
  */
object Bronze {

  /** S3 consumer config (kafka_consumer_s3.py:127-135) as source options. */
  def kafkaSourceOptions(bootstrap: String, topic: String,
      maxPerTrigger: Long = 10000): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> "earliest",
    "maxOffsetsPerTrigger" -> maxPerTrigger.toString,
    "failOnDataLoss" -> "false")

  /** S2 producer config (weather_producer.py:146-154): acks=all + gzip +
    * idempotence ordering live in kafka.* passthrough options. */
  def kafkaSinkOptions(bootstrap: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "kafka.acks" -> "all",
    "kafka.compression.type" -> "gzip",
    "kafka.retries" -> "3",
    "kafka.max.in.flight.requests.per.connection" -> "1")

  /** Kafka wire → typed rows + lineage columns (S3/S5: the reference
    * appends _kafka_partition/_offset/_timestamp, kafka_consumer_s3.py:
    * 202-224). Works on any kafka-shaped frame (value/partition/offset/
    * timestamp), batch or streaming. */
  def fromKafkaJson(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(
        from_json(col("value").cast("string"), schema).as("r"),
        col("partition").as("_kafka_partition"),
        col("offset").as("_kafka_offset"),
        col("timestamp").as("_kafka_timestamp"))
      .select(col("r.*"), col("_kafka_partition"), col("_kafka_offset"),
        col("_kafka_timestamp"))

  /** Records → kafka wire shape: key by entity, JSON value (S2,
    * weather_producer.py:146-192). */
  def toKafkaJson(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Hive-partitioned batch append (S8, silver_processor.py:308-331). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: String = "append"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Streaming ingest → partitioned Bronze parquet with checkpointed
    * exactly-once (S4). Trigger.AvailableNow = the reference's bounded
    * drain-then-stop loop (weather_pipeline_dag.py:100-124). */
  def ingestStream(src: DataFrame, path: String, checkpoint: String): StreamingQuery =
    src
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .writeStream
      .format("parquet")
      .partitionBy("year", "month", "day")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Small-files compaction: rewrite a Hive-partitioned dataset through
    * an AQE REBALANCE on the partition columns, which coalesces (or
    * splits) shuffle output to the advisory partition size — each
    * partition directory ends up with few right-sized files instead of
    * one fragment per original task. The cure for a streaming Bronze
    * sink's per-micro-batch file accumulation at 100 TB; run it as a
    * periodic maintenance pass over closed partitions. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      partitionCols: Seq[String]): Unit =
    spark.read.parquet(inPath)
      .hint("rebalance", partitionCols: _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outPath)

  /** Bronze scan with declarative partition pruning — Catalyst prunes
    * year=/month=/day= directories from the filter, replacing the
    * reference's python path-string building (silver_processor.py:
    * 134-140, SURVEY §4). */
  def readBronze(spark: SparkSession, path: String,
      date: Option[java.time.LocalDate] = None): DataFrame = {
    val df = spark.read.parquet(path)
    date.fold(df) { d =>
      df.filter(col("year") === d.getYear
        && col("month") === d.getMonthValue && col("day") === d.getDayOfMonth)
    }
  }

  /** Tolerant Bronze scan: skips corrupt/truncated parquet files instead
    * of failing the job — at fleet scale a landing zone always carries a
    * few half-written files from crashed producers, and one of them must
    * not kill an hourly run. Schema is pinned (no inference over damaged
    * footers); pair with a dead-letter sweep that moves skipped files. */
  def readBronzeTolerant(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .option("ignoreCorruptFiles", "true")
      .schema(schema)
      .parquet(path)

  /** Partition-level retention sweep for parquet layers (cleanup_old_data
    * for the lake side, sql/schema.sql:259-286 / config.yaml:112-115 —
    * bronze 30 d, silver 90 d). Walks Hive-style `year=`/`month=`/`day=`
    * directories and drops every directory whose LAST covered date is
    * older than the cutoff, so a partially-expired month survives until
    * its newest day expires. Deleting whole partition directories is the
    * lake analog of the reference's SQL DELETE — no rewrite, no scan, and
    * at 100 TB it's a handful of namenode ops instead of a job. Driver-
    * side by design (control plane); `today` is injectable for tests.
    * Returns the number of partition directories removed. */
  def retentionSweep(spark: SparkSession, path: String, keepDays: Int,
      today: java.time.LocalDate = java.time.LocalDate.now()): Long = {
    import org.apache.hadoop.fs.Path
    val cutoff = today.minusDays(keepDays)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0L
    def kv(name: String): Option[(String, Int)] = name.split("=", 2) match {
      case Array(k, v) if Set("year", "month", "day")(k) =>
        scala.util.Try(v.toInt).toOption.map(k -> _)
      case _ => None
    }
    // last calendar date a year[/month[/day]] directory can contain;
    // None for values that form no real date (month=0/13, day=32, …) so a
    // stray malformed directory is walked past, never deleted and never
    // able to abort the sweep mid-walk with a DateTimeException
    def lastCovered(ctx: Map[String, Int]): Option[java.time.LocalDate] =
      ctx.get("year").flatMap { y =>
        scala.util.Try {
          val m = ctx.getOrElse("month", 12)
          val d = ctx.get("day").getOrElse(java.time.YearMonth.of(y, m).lengthOfMonth())
          java.time.LocalDate.of(y, m, d)
        }.toOption
      }
    val deleted = scala.collection.mutable.ListBuffer.empty[Path]
    def walk(dir: Path, ctx: Map[String, Int]): Long =
      fs.listStatus(dir).filter(_.isDirectory).map { st =>
        kv(st.getPath.getName) match {
          case Some((k, v)) =>
            val next = ctx + (k -> v)
            if (lastCovered(next).exists(_.isBefore(cutoff))) {
              fs.delete(st.getPath, true); deleted += st.getPath; 1L
            } else walk(st.getPath, next)
          case None => walk(st.getPath, ctx) // non-date partition level
        }
      }.sum
    val removed = walk(root, Map.empty)
    // Always invoked (even when nothing expired): its entry pass recovers
    // a manifest orphaned by a crash during a PREVIOUS sweep's swap.
    pruneSinkLog(fs, root, deleted.toList)
    if (removed > 0)
      spark.catalog.refreshByPath(path) // re-cache persisted plans over this root
    removed
  }

  /** Drop swept files from a streaming file-sink manifest.
    *
    * A layer written by `writeStream.format("parquet")` carries a
    * `_spark_metadata` transaction log, and batch reads of that root are
    * resolved FROM THE LOG, not from a directory listing — so deleting
    * partition directories without rewriting the log leaves a manifest
    * that references vanished files and every downstream scan dies with
    * FileNotFoundException. The log's on-disk format is line-oriented: a
    * `v1` header, then one JSON `SinkFileStatus` per committed file
    * (`.compact` snapshots use the same shape). Retention therefore
    * rewrites each log file, dropping entries whose path sits under a
    * swept directory — batch ids and surviving entries are untouched, so
    * the sink's exactly-once replay guard and readers' consistency
    * guarantee both hold. Run at retention cadence with no concurrent
    * ingest (the reference's cleanup is likewise a post-gate DAG task). */
  private def pruneSinkLog(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      deletedDirs: Seq[org.apache.hadoop.fs.Path]): Unit = {
    import org.apache.hadoop.fs.Path
    val logDir = new Path(root, "_spark_metadata")
    if (!fs.exists(logDir)) return
    val pathField = """"path":"([^"]+)"""".r
    def entryPath(line: String): Option[Path] =
      pathField.findFirstMatchIn(line).map(m => new Path(m.group(1)))
    def readLines(p: Path): List[String] = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    // Recoverable swap: the original is renamed aside (not deleted)
    // before the rewrite moves in, so every intermediate state still
    // holds a readable copy of the log file — a crash at any point is
    // undone by the recovery pass on the next run. The old
    // delete-then-rename shape had a window where a crash lost the
    // file outright (replayed batch or broken sink reads).
    def rewrite(f: Path, drop: String => Boolean): Unit = {
      val lines = readLines(f)
      val kept = lines.filterNot(drop)
      if (kept.size != lines.size) {
        val tmp = new Path(logDir, s".${f.getName}.retention.tmp")
        val bak = new Path(logDir, s".${f.getName}.retention.bak")
        val out = fs.create(tmp, true)
        try out.write((kept.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
        fs.rename(f, bak)
        fs.rename(tmp, f)
        fs.delete(bak, false)
      }
    }
    // Recover from a crash mid-swap before touching anything: a stale
    // `.N.retention.bak` whose original is missing means the process died
    // between moving the original aside and moving the rewrite in — the
    // .bak IS the log file; restore it. A .bak whose original exists is
    // residue from a crash after the new file landed — drop it. Leftover
    // .tmp files are always incomplete writes — drop them.
    val interrupted = Set.newBuilder[String]
    fs.listStatus(logDir).filter(_.isFile).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(".") && name.endsWith(".retention.tmp")) {
        interrupted += name.stripPrefix(".").stripSuffix(".retention.tmp")
        fs.delete(st.getPath, false)
      } else if (name.startsWith(".") && name.endsWith(".retention.bak")) {
        val base = name.stripPrefix(".").stripSuffix(".retention.bak")
        interrupted += base
        val orig = new Path(logDir, base)
        if (!fs.exists(orig)) fs.rename(st.getPath, orig)
        else fs.delete(st.getPath, false)
      }
    }
    // A restored (or residue-flagged) log file may still hold entries a
    // PREVIOUS sweep's partition deletes orphaned — those dirs are gone,
    // so prefix matching against this run's deletions can never catch
    // them again. For exactly the interrupted files, fall back to the
    // ground truth and drop entries whose data file no longer exists
    // (bounded to the rare crash-recovery case, never the normal path).
    interrupted.result().foreach { base =>
      val f = new Path(logDir, base)
      if (fs.exists(f))
        rewrite(f, line => entryPath(line).exists(p => !fs.exists(p)))
    }
    if (deletedDirs.isEmpty) return
    val prefixes = deletedDirs.map(_.toUri.getPath + "/")
    def swept(line: String): Boolean =
      entryPath(line).exists(p => prefixes.exists(p.toUri.getPath.startsWith))
    fs.listStatus(logDir)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .foreach(st => rewrite(st.getPath, swept))
  }

  /** Schema-evolved Bronze scan: producers add fields over time, so
    * partition directories carry mixed schemas. mergeSchema unions the
    * footers (older files surface the new columns as null) — the read
    * stays a plain vectorized scan; only the footer merge costs extra,
    * so reserve this for evolving zones and pin the schema elsewhere. */
  def readBronzeEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
