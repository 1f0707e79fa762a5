package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) joins — an operator family Spark has no native
  * physical strategy for: a raw `a.join(b, rangePredicate)` plans as a
  * nested-loop join, O(|A|·|B|) per key group.
  *
  * The scalable form here converts the theta-join into an equi-join by
  * time binning: both sides bucket `ts` into fixed `gap`-width bins, the
  * probe side additionally explodes into its bin and the next one (any
  * match within `gap` lies in one of the two), and the exact predicate
  * refines the candidates. Cost becomes O(colliding-bin pairs) with a
  * plain shuffle on (key, bin) — the standard interval-join layout used
  * by stream processors, and the same shape AQE can skew-split.
  *
  * Each qualifying pair lands in exactly one (probe-bin, build-bin)
  * combination, so no post-join dedup is needed.
  */
object Ranged {

  /** Pairs (a, b) with the same `key` and `tsB ∈ (tsA, tsA + gapSecs]`,
    * via bin-bucketed equi-join. Inputs must expose distinct column
    * names; the range columns are referenced by name. */
  def rangeJoinBinned(a: DataFrame, b: DataFrame, key: String,
      tsA: String, tsB: String, gapSecs: Long): DataFrame = {
    val binOf = (c: Column) => floor(unix_timestamp(c) / gapSecs)
    val probe = a.withColumn("bin", explode(array(binOf(col(tsA)), binOf(col(tsA)) + 1)))
    val build = b.withColumn("bin", binOf(col(tsB)))
    probe.join(build, Seq(key, "bin"))
      .filter(col(tsB) > col(tsA) &&
        col(tsB) <= col(tsA) + expr(s"INTERVAL $gapSecs SECONDS"))
      .drop("bin")
  }

  /** Follow-up events: for each event, the events by the same user within
    * the next 30 minutes, with the exact gap in microseconds. */
  def qEventFollowups(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val a = ev.select(col("event_id").as("event_a"), col("user_id"),
      col("ts").as("ts_a"), col("event_type").as("type_a"))
    val b = ev.select(col("event_id").as("event_b"), col("user_id"),
      col("ts").as("ts_b"), col("event_type").as("type_b"))
    rangeJoinBinned(a, b, "user_id", "ts_a", "ts_b", 1800L)
      .select(col("event_a"), col("event_b"), col("type_a"), col("type_b"),
        (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("gap_micros"))
      .orderBy(col("event_a"), col("event_b"))
  }

  /** Oracle: brute-force interval join (exact same predicate). */
  def oEventFollowups: String =
    """SELECT a.event_id AS event_a, b.event_id AS event_b,
      |  a.event_type AS type_a, b.event_type AS type_b,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_micros
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND b.ts > a.ts
      | AND b.ts <= a.ts + INTERVAL 30 MINUTE
      |ORDER BY event_a, event_b""".stripMargin
}
