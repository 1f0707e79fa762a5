package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-layer JDBC serving sink (gold_loader.py re-expressed).
  *
  * The reference "handles" replays by letting the unique index reject
  * duplicates and swallowing the error (gold_loader.py:313-319). Here
  * idempotence is first-class: incoming batches are left-anti-joined
  * against the existing natural keys before append. At scale the key
  * probe reads only the key columns over JDBC (column pruning pushes into
  * the remote scan) and the anti-join broadcasts whichever side is small.
  */
object JdbcSink {

  /** Pure core of the idempotent append (unit-testable without a DB). */
  def newRowsOnly(incoming: DataFrame, existingKeys: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming.join(existingKeys.select(keys.map(col): _*), keys, "left_anti")

  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Append only rows whose natural key is not already present. */
  def idempotentAppend(spark: SparkSession, df: DataFrame, url: String,
      table: String, keys: Seq[String],
      props: Properties = new Properties): Long = {
    val existing = readTable(spark, url, table, props).select(keys.map(col): _*)
    val fresh = newRowsOnly(df, existing, keys)
    val n = fresh.count()
    if (n > 0) fresh.write.mode("append").jdbc(url, table, props)
    n
  }

  /** Plain append (exact reference parity mode, S9). */
  def append(df: DataFrame, url: String, table: String,
      props: Properties = new Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)

  private def withConn[T](url: String)(f: Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** Run ledger (gold_loader.py:77-167 / pipeline_execution_log,
    * sql/schema.sql:185-199): driver-side row-at-a-time JDBC, independent
    * of the executor write path — mirrors the reference's psycopg2 side
    * channel (S10). */
  final class PipelineLog(url: String) {

    def ensureTable(): Unit = withConn(url) { c =>
      val meta = c.getMetaData.getTables(null, null, "PIPELINE_EXECUTION_LOG", null)
      if (!meta.next()) {
        c.createStatement().executeUpdate(
          """CREATE TABLE pipeline_execution_log (
            |  execution_id VARCHAR(36) NOT NULL,
            |  stage VARCHAR(64) NOT NULL,
            |  attempt INT NOT NULL DEFAULT 1,
            |  status VARCHAR(16) NOT NULL,
            |  started_at TIMESTAMP,
            |  finished_at TIMESTAMP,
            |  duration_secs DOUBLE,
            |  rows_processed BIGINT,
            |  metadata VARCHAR(4000)
            |)""".stripMargin)
      }
    }

    def logStart(executionId: String, stage: String, attempt: Int = 1): Long = {
      val now = System.currentTimeMillis()
      withConn(url) { c =>
        val ps = c.prepareStatement(
          "INSERT INTO pipeline_execution_log (execution_id, stage, attempt, status, started_at) VALUES (?,?,?,?,?)")
        ps.setString(1, executionId); ps.setString(2, stage)
        ps.setInt(3, attempt)
        ps.setString(4, "RUNNING"); ps.setTimestamp(5, new java.sql.Timestamp(now))
        ps.executeUpdate()
      }
      now
    }

    def logEnd(executionId: String, stage: String, startedMs: Long,
        status: String, rows: Long, metadataJson: String = "{}",
        attempt: Int = 1): Unit = {
      val now = System.currentTimeMillis()
      withConn(url) { c =>
        val ps = c.prepareStatement(
          """UPDATE pipeline_execution_log SET status=?, finished_at=?,
            |duration_secs=?, rows_processed=?, metadata=?
            |WHERE execution_id=? AND stage=? AND attempt=?""".stripMargin)
        ps.setString(1, status); ps.setTimestamp(2, new java.sql.Timestamp(now))
        ps.setDouble(3, (now - startedMs) / 1000.0); ps.setLong(4, rows)
        ps.setString(5, metadataJson); ps.setString(6, executionId)
        ps.setString(7, stage); ps.setInt(8, attempt)
        ps.executeUpdate()
      }
    }

    /** Latest attempt's status for the stage. */
    def statusOf(executionId: String, stage: String): Option[(String, Long)] =
      withConn(url) { c =>
        val ps = c.prepareStatement(
          """SELECT status, rows_processed FROM pipeline_execution_log
            |WHERE execution_id=? AND stage=?
            |ORDER BY attempt DESC FETCH FIRST 1 ROWS ONLY""".stripMargin)
        ps.setString(1, executionId); ps.setString(2, stage)
        val rs = ps.executeQuery()
        if (rs.next()) Some((rs.getString(1), rs.getLong(2))) else None
      }

    /** Every attempt of the stage, oldest first: (attempt, status). */
    def attemptsOf(executionId: String, stage: String): Seq[(Int, String)] =
      withConn(url) { c =>
        val ps = c.prepareStatement(
          """SELECT attempt, status FROM pipeline_execution_log
            |WHERE execution_id=? AND stage=? ORDER BY attempt""".stripMargin)
        ps.setString(1, executionId); ps.setString(2, stage)
        val rs = ps.executeQuery()
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
        while (rs.next()) out += ((rs.getInt(1), rs.getString(2)))
        out.toSeq
      }
  }

  /** Retention cleanup (cleanup_old_data, sql/schema.sql:259-286):
    * driver-side delete, returns rows removed. */
  def retentionDelete(url: String, table: String, tsCol: String,
      keepDays: Int): Int = withConn(url) { c =>
    val cutoff = new java.sql.Timestamp(
      System.currentTimeMillis() - keepDays * 86400000L)
    val ps = c.prepareStatement(s"DELETE FROM $table WHERE $tsCol < ?")
    ps.setTimestamp(1, cutoff)
    ps.executeUpdate()
  }
}
