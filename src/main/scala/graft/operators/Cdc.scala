package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Changelog apply (CDC MERGE): fold an ordered stream of upserts and
  * delete tombstones into current-state rows — the Debezium/MERGE INTO
  * shape a lakehouse ingests operational tables with, implemented as
  * plain DataFrame ops over parquet (no table-format dependency).
  *
  * Change records here are derived from the `events` stream: each event
  * updates its user's state; an `error` event is a tombstone (account
  * invalidated). Ordering is (ts, event_id) — event_id is the unique
  * tie-break, standing in for the source LSN a real connector carries.
  *
  * Semantics: latest change per key wins; if the latest is a tombstone
  * the key has NO current row. A tombstone only matters when it is
  * latest, which is exactly why [[cdcApply]] ≡ [[cdcBuild]] holds
  * without the snapshot retaining deleted keys: any later upsert
  * resurrects the key from the batch alone.
  *
  * Scale shape (100 TB): [[cdcBuild]] is ONE shuffle (a per-key window
  * over the log). [[cdcApply]] — the steady-state path — touches ONLY
  * batch keys: a broadcast-semi restriction carves the affected
  * snapshot rows, the merge window runs over (affected ∪ batch) which
  * is batch-sized, and untouched snapshot rows pass through with an
  * anti join, never entering the window shuffle. Daily cost tracks the
  * batch, not the accumulated state — the SCD2-apply discipline
  * (`Scd.scd2Apply`).
  */
object Cdc {

  val Cutoff = "2024-01-24 00:00:00"

  /** events → change records: op, key, payload, ordering columns. */
  def asChangelog(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      col("event_type"), col("value"), col("ts"), col("event_id"))

  private val keyWin =
    Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)

  /** Full-log fold: latest change per key, tombstones drop the key. */
  def cdcBuild(changes: DataFrame): DataFrame =
    changes
      .withColumn("rnk", row_number().over(keyWin))
      .filter(col("rnk") === 1 && col("op") === "U")
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("value").as("last_value"), col("ts").as("updated_at"),
        col("event_id").as("last_event_id"))

  /** Incremental merge: snapshot rows re-enter the fold as pseudo-upserts
    * at their recorded (updated_at, last_event_id); only keys present in
    * the batch pay the window shuffle. */
  def cdcApply(snapshot: DataFrame, batch: DataFrame): DataFrame = {
    val batchKeys = batch.select("user_id").distinct()
    val affected = snapshot
      .join(broadcast(batchKeys), Seq("user_id"), "left_semi")
      .select(col("user_id"), lit("U").as("op"),
        col("last_event_type").as("event_type"),
        col("last_value").as("value"),
        col("updated_at").as("ts"),
        col("last_event_id").as("event_id"))
    val untouched = snapshot
      .join(broadcast(batchKeys), Seq("user_id"), "left_anti")
    cdcBuild(affected.unionByName(asChangelog(batch))).unionByName(untouched)
  }

  /** Build current state from the whole event log. */
  def qCdcBuild(spark: SparkSession, dir: String): DataFrame =
    cdcBuild(asChangelog(Tables.events(spark, dir))).orderBy("user_id")

  /** Snapshot at the cutoff, then apply the post-cutoff week as a batch
    * — must equal the full rebuild (the shared oracle proves it). */
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val snapshot = cdcBuild(asChangelog(
      events.filter(col("ts") < lit(Cutoff).cast("timestamp"))))
    val batch = events.filter(col("ts") >= lit(Cutoff).cast("timestamp"))
    cdcApply(snapshot, batch).orderBy("user_id")
  }

  /** Full-log twin — both queries share it: the incremental apply is
    * correct exactly when it reproduces the from-scratch fold. */
  val oCdcState: String =
    """WITH c AS (
      |  SELECT user_id, event_type, value, ts, event_id,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rnk
      |  FROM events)
      |SELECT user_id, event_type AS last_event_type, value AS last_value,
      |  ts AS updated_at, event_id AS last_event_id
      |FROM c WHERE rnk = 1 AND op = 'U'
      |ORDER BY user_id""".stripMargin
}
