package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcSink
import graft.StageRunner.{Notifier, RetryPolicy, StageTimeoutException}

/** Airflow-parity operational semantics: per-stage retry with delay,
  * per-attempt ledger rows, failure/retry/success notifications, and the
  * execution timeout (weather_pipeline_dag.py:15-23,226-260). Pure
  * JVM-side — no Spark needed. */
class StageRunnerSpec extends AnyFunSuite {

  private def freshLog(): JdbcSink.PipelineLog = {
    val l = new JdbcSink.PipelineLog(
      s"jdbc:derby:memory:ledger${System.nanoTime()};create=true")
    l.ensureTable(); l
  }

  private class RecordingNotifier extends Notifier {
    val retries = new scala.collection.mutable.ArrayBuffer[(String, Int)]
    val failures = new scala.collection.mutable.ArrayBuffer[(String, Int)]
    override def onRetry(stage: String, attempt: Int, e: Throwable): Unit =
      retries += ((stage, attempt))
    override def onStageFailure(stage: String, attempts: Int, e: Throwable): Unit =
      failures += ((stage, attempts))
  }

  test("transiently-failing stage succeeds on retry; both attempts hit the ledger") {
    val log = freshLog()
    val notifier = new RecordingNotifier
    val sleeps = new scala.collection.mutable.ArrayBuffer[Long]
    val runner = new StageRunner("exec-1", Some(log),
      RetryPolicy(retries = 3, retryDelayMs = 123, executionTimeoutMs = 0),
      notifier, sleeps += _)
    val calls = new AtomicInteger(0)
    val out = runner.staged[Long]("silver", identity) {
      if (calls.incrementAndGet() == 1) sys.error("transient IO blip")
      42L
    }
    assert(out == 42L && calls.get() == 2)
    assert(log.attemptsOf("exec-1", "silver") ==
      Seq((1, "FAILURE"), (2, "SUCCESS")), "one row per attempt")
    assert(log.statusOf("exec-1", "silver").exists(_._1 == "SUCCESS"),
      "latest-attempt status wins")
    assert(notifier.retries.toSeq == Seq(("silver", 1)) && notifier.failures.isEmpty)
    assert(sleeps.toSeq == Seq(123L), "retry_delay honored between attempts")
  }

  test("persistently-failing stage exhausts retries, notifies failure, rethrows") {
    val log = freshLog()
    val notifier = new RecordingNotifier
    val runner = new StageRunner("exec-2", Some(log),
      RetryPolicy(retries = 2, retryDelayMs = 1, executionTimeoutMs = 0),
      notifier, _ => ())
    val calls = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      runner.staged[Long]("gold_load", identity) {
        calls.incrementAndGet(); sys.error("db down")
      }
    }
    assert(e.getMessage == "db down")
    assert(calls.get() == 3, "1 initial + 2 retries, like Airflow retries=2")
    assert(log.attemptsOf("exec-2", "gold_load").map(_._2) ==
      Seq("FAILURE", "FAILURE", "FAILURE"))
    assert(notifier.retries.map(_._2).toSeq == Seq(1, 2))
    assert(notifier.failures.toSeq == Seq(("gold_load", 3)))
  }

  test("execution timeout aborts a hung stage and is retryable like any failure") {
    val runner = new StageRunner("exec-3", None,
      RetryPolicy(retries = 0, retryDelayMs = 0, executionTimeoutMs = 50),
      Notifier.noop, _ => ())
    intercept[StageTimeoutException] {
      runner.staged[Unit]("bronze_ingest", _ => 0L) {
        Thread.sleep(5000)
      }
    }
  }

  test("retry after a partially-completed load does not double-write (idempotence × retry)") {
    // the operational composition that matters: attempt 1 WRITES then
    // dies before reporting; the retry must not duplicate its rows
    import graft.sinks.JdbcSink
    val spark = SharedSpark.spark
    import spark.implicits._
    val url = s"jdbc:derby:memory:retrywrite${System.nanoTime()};create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      """CREATE TABLE gold_x ("k" INT, "v" DOUBLE)""")
    finally c.close()
    val batch = Seq((1, 1.0), (2, 2.0)).toDF("k", "v")
    val runner = new StageRunner("exec-5", None,
      RetryPolicy(retries = 2, retryDelayMs = 0, executionTimeoutMs = 0),
      Notifier.noop, _ => ())
    val calls = new AtomicInteger(0)
    val loaded = runner.staged[Long]("gold_load", identity) {
      val n = JdbcSink.idempotentAppend(spark, batch, url, "gold_x", Seq("k"))
      if (calls.incrementAndGet() == 1) sys.error("died after write, before ack")
      n
    }
    assert(loaded == 0L, "retry found every key already present")
    assert(JdbcSink.readTable(spark, url, "gold_x").count() == 2,
      "exactly one copy despite the replayed write")
  }

  test("ledger metadata holds large blobs; a legacy VARCHAR(4000) table is widened") {
    // fresh table: CLOB column, a 100k-char blob round-trips intact
    val log = freshLog()
    val blob = """{"detail":"""" + ("x" * 100000) + """"}"""
    val t0 = log.logStart("exec-m", "silver")
    log.logEnd("exec-m", "silver", t0, "SUCCESS", 1L, blob)
    assert(log.metadataOf("exec-m", "silver").contains(blob),
      "CLOB metadata must not truncate")

    // legacy table: the VARCHAR(4000) release's DDL; ensureTable widens
    // it in place and oversized writes degrade to the guarded length
    val url = s"jdbc:derby:memory:ledgerlegacy${System.nanoTime()};create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      """CREATE TABLE pipeline_execution_log (
        |  execution_id VARCHAR(36) NOT NULL, stage VARCHAR(64) NOT NULL,
        |  attempt INT NOT NULL DEFAULT 1, status VARCHAR(16) NOT NULL,
        |  started_at TIMESTAMP, finished_at TIMESTAMP,
        |  duration_secs DOUBLE, rows_processed BIGINT,
        |  metadata VARCHAR(4000)
        |)""".stripMargin)
    finally c.close()
    val legacy = new JdbcSink.PipelineLog(url)
    legacy.ensureTable() // widens VARCHAR(4000) → VARCHAR(32672)
    val mid = "y" * 20000 // fits the widened column, not the original
    val t1 = legacy.logStart("exec-l", "gold_load")
    legacy.logEnd("exec-l", "gold_load", t1, "SUCCESS", 1L, mid)
    assert(legacy.metadataOf("exec-l", "gold_load").contains(mid))
    // beyond even the widened ceiling, the guard truncates instead of failing
    val huge = "z" * 50000
    val t2 = legacy.logStart("exec-l", "cleanup_old_data")
    legacy.logEnd("exec-l", "cleanup_old_data", t2, "SUCCESS", 1L, huge)
    assert(legacy.metadataOf("exec-l", "cleanup_old_data")
      .exists(m => m.length == 32672 && m.forall(_ == 'z')),
      "oversized blob must degrade to the guarded length, not fail")
  }

  test("retries=0 preserves single-attempt semantics") {
    val log = freshLog()
    val runner = new StageRunner("exec-4", Some(log),
      RetryPolicy(retries = 0, retryDelayMs = 0, executionTimeoutMs = 0),
      Notifier.noop, _ => ())
    intercept[RuntimeException] {
      runner.staged[Long]("silver", identity)(sys.error("boom"))
    }
    assert(log.attemptsOf("exec-4", "silver").map(_._2) == Seq("FAILURE"))
  }
}
