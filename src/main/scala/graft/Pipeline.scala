package graft

import java.time.LocalDate
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Serving, Silver}
import graft.sinks.JdbcSink
import graft.sources.Bronze

/** End-to-end pipeline driver: the reference's Airflow DAG (SURVEY §3 E3)
  * collapsed into one program — ingest → silver → gold → quality gate →
  * ledger — with the reference's pessimizations removed:
  *  - one pass per stage, metrics via observe() instead of eager
  *    re-counts (SURVEY §2.11);
  *  - the enriched frame is cached before fanning out to detail + two
  *    aggregate writes (the reference recomputed it per write);
  *  - gold loads are idempotent by anti-join, not by swallowing
  *    duplicate-key errors.
  */
object Pipeline {

  case class Config(
      sourceDir: String,
      warehouseDir: String,
      jdbcUrl: Option[String] = None,
      date: Option[LocalDate] = None,
      retry: StageRunner.RetryPolicy = StageRunner.RetryPolicy(retries = 0),
      notifier: StageRunner.Notifier = StageRunner.Notifier.noop,
      sleeper: Long => Unit = Thread.sleep)

  case class Report(
      executionId: String,
      bronzeRows: Long,
      silverRows: Long,
      goldRowsLoaded: Long,
      duplicateKeys: Long,
      criticalNulls: Long,
      gatePassed: Boolean)

  def run(spark: SparkSession, cfg: Config): Report = {
    val executionId = UUID.randomUUID().toString
    val log = cfg.jdbcUrl.map { url =>
      val l = new JdbcSink.PipelineLog(url); l.ensureTable(); l
    }
    val runner = new StageRunner(executionId, log, cfg.retry, cfg.notifier, cfg.sleeper)
    def staged[T](stage: String, rows: T => Long)(f: => T): T =
      runner.staged(stage, rows)(f)

    // 1. ingest: events stream → partitioned Bronze (AvailableNow drain)
    val bronzePath = s"${cfg.warehouseDir}/bronze/events"
    staged[Unit]("bronze_ingest", _ => 0L) {
      val src = Tables.eventsStream(spark, s"${cfg.warehouseDir}/landing")
      val q = Bronze.ingestStream(src, bronzePath, s"${cfg.warehouseDir}/checkpoints/bronze")
      q.awaitTermination()
    }
    // Bronze row count rides the silver job as an observe() metric on the
    // scan node — no separate count pass over Bronze (SURVEY §2.11; same
    // treatment the silver count already gets).
    val bronzeObs = org.apache.spark.sql.Observation("bronze_rows")
    val bronze = Bronze.readBronze(spark, bronzePath, cfg.date)
      .observe(bronzeObs, count(lit(1)).as("rows"))

    // 2. silver: clean + enrich once, fan out to detail + 2 aggregates.
    // Row count comes from observe() on the detail write — one metric
    // piggybacked on the job instead of the reference's recount pass
    // (silver_processor.py:321-327, SURVEY §2.11).
    val silverPath = s"${cfg.warehouseDir}/silver"
    val enriched = Silver.enrich(Silver.clean(bronze))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val silverRows = staged[Long]("silver", identity) {
      val obs = org.apache.spark.sql.Observation("silver_rows")
      Bronze.writePartitioned(
        enriched.observe(obs, count(lit(1)).as("rows")),
        s"$silverPath/events_cleaned", Seq("year", "month"))
      Bronze.writePartitioned(
        Silver.dailyAgg(enriched), s"$silverPath/events_daily_agg", Seq("year", "month"))
      Bronze.writePartitioned(
        Silver.hourlyAgg(enriched), s"$silverPath/events_hourly_agg", Seq("year", "month"))
      obs.get("rows").asInstanceOf[Long]
    }
    val bronzeRows = bronzeObs.get("rows").asInstanceOf[Long]

    // 3. gold: idempotent load (JDBC if configured, else parquet dedup-merge)
    val goldRows = staged[Long]("gold_load", identity) {
      val daily = spark.read.parquet(s"$silverPath/events_daily_agg")
        .select("event_type", "year", "month", "day", "avg_value", "min_value",
          "max_value", "sum_value", "record_count", "distinct_users")
      cfg.jdbcUrl match {
        case Some(url) =>
          ensureGoldTable(url)
          JdbcSink.idempotentAppend(spark, daily, url, "gold_events_daily",
            Seq("event_type", "year", "month", "day"))
        case None =>
          val goldPath = s"${cfg.warehouseDir}/gold/events_daily"
          val existing =
            try spark.read.parquet(goldPath).select("event_type", "year", "month", "day")
            catch { case _: Throwable => spark.emptyDataFrame }
          val fresh =
            if (existing.columns.isEmpty) daily
            else JdbcSink.newRowsOnly(daily, existing, Seq("event_type", "year", "month", "day"))
          val n = fresh.count()
          if (n > 0) fresh.write.mode("append").parquet(goldPath)
          n
      }
    }

    // 4. quality gate (weather_pipeline_dag.py:166-223): nonzero output,
    // duplicate natural keys, critical nulls
    val dups = Serving.dupScan(enriched, Seq("user_id", "ts")).count()
    val nulls = enriched.filter(col("user_id").isNull || col("value").isNull).count()
    val gate = silverRows > 0 && dups == 0 && nulls == 0
    enriched.unpersist()

    // 5. retention (cleanup_old_data analog) — gold JDBC only
    cfg.jdbcUrl.foreach { url => /* retention on real deployments:
      JdbcSink.retentionDelete(url, "gold_events_daily", "load_ts", 365) */ }

    val report = Report(executionId, bronzeRows, silverRows, goldRows, dups, nulls, gate)
    cfg.notifier.onSuccess(report)
    report
  }

  private def ensureGoldTable(url: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val meta = c.getMetaData.getTables(null, null, "GOLD_EVENTS_DAILY", null)
      if (!meta.next()) {
        c.createStatement().executeUpdate(
          """CREATE TABLE gold_events_daily (
            |  "event_type" VARCHAR(32), "year" INT, "month" INT, "day" INT,
            |  "avg_value" DOUBLE, "min_value" DOUBLE, "max_value" DOUBLE,
            |  "sum_value" DOUBLE, "record_count" BIGINT, "distinct_users" BIGINT
            |)""".stripMargin)
      }
    } finally c.close()
  }
}
