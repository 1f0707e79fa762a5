package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-drift monitoring — compare a metric's histogram between
  * a baseline window and the current window, per fixed bucket, with a
  * χ²-style divergence contribution per bucket. The ops use: catch a
  * silent upstream change (new client version, schema default, bot
  * traffic) by its shape change, before it poisons downstream training
  * data — the monitoring counterpart of [[Expectations]]' hard
  * contracts.
  *
  * Buckets are FIXED-EDGE (floor(value/width), clamped), not quantile-
  * based: fixed edges make the histogram mergeable across partitions
  * and days (partial-agg counts), comparable across runs, and exactly
  * reproducible. A dense bucket spine (range join) keeps zero-count
  * buckets in the report — a bucket that went to zero IS the signal.
  *
  * Determinism: counts are exact longs; ratios and per-bucket
  * contributions are a handful of exactly-rounded IEEE ops on exact
  * integers — no data-order float summation anywhere (the operator
  * deliberately reports PER-BUCKET contributions; the scalar χ² is a
  * fixed-order fold the caller does over 10 rows, spec-pinned) — so
  * the full report carries a DuckDB hash gate.
  *
  * Scale shape (100 TB): one scan with conditional partial aggregation
  * into ≤ nBuckets groups, a 10-row broadcast spine join, and a 1-row
  * totals broadcast — shuffle is #buckets rows regardless of input.
  */
object Monitor {

  val BucketWidth = 50.0
  val NBuckets = 10
  val BaseEnd = "2024-01-08 00:00:00"
  val CurrStart = "2024-01-22 00:00:00"

  def valueDrift(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val period = when(col("ts") < lit(BaseEnd).cast("timestamp"), "base")
      .when(col("ts") >= lit(CurrStart).cast("timestamp"), "curr")
    val bucket = least(floor(col("value") / lit(BucketWidth)),
      lit((NBuckets - 1).toLong)).cast("long")
    val counts = events
      .withColumn("period", period).filter(col("period").isNotNull)
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(sum(when(col("period") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("period") === "curr", 1L).otherwise(0L)).as("n_curr"))
    val spine = spark.range(0, NBuckets).select(col("id").as("bucket"))
    // totals via an unpartitioned whole-frame window over the (≤ nBuckets)
    // report rows — NOT a separate aggregate leg, which would re-derive
    // the counts subtree and scan the events twice (plan-audited: this
    // keeps the query at ONE corpus scan; the single-partition window
    // touches 10 rows)
    val whole = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pB = col("n_base") / sum(col("n_base")).over(whole)
    val pC = col("n_curr") / sum(col("n_curr")).over(whole)
    spine
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_base", "n_curr"))
      .withColumn("p_base", pB)
      .withColumn("p_curr", pC)
      .withColumn("contrib",
        when(col("p_base") + col("p_curr") === 0.0, 0.0)
          .otherwise((col("p_base") - col("p_curr")) * (col("p_base") - col("p_curr"))
            / (col("p_base") + col("p_curr"))))
      .select(col("bucket"), col("n_base"), col("n_curr"),
        col("p_base"), col("p_curr"), col("contrib"))
      .orderBy("bucket")
  }

  def qValueDrift(spark: SparkSession, dir: String): DataFrame =
    valueDrift(Tables.events(spark, dir))

  val oValueDrift: String =
    s"""WITH c AS (
      |  SELECT least(CAST(floor(value / $BucketWidth) AS BIGINT), ${NBuckets - 1}) AS bucket,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '$BaseEnd' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '$CurrStart' THEN 1 ELSE 0 END) AS BIGINT) AS n_curr
      |  FROM events
      |  WHERE ts < TIMESTAMP '$BaseEnd' OR ts >= TIMESTAMP '$CurrStart'
      |  GROUP BY 1),
      |t AS (SELECT CAST(sum(n_base) AS BIGINT) AS t_base,
      |             CAST(sum(n_curr) AS BIGINT) AS t_curr FROM c),
      |s AS (SELECT range AS bucket FROM range(0, $NBuckets))
      |SELECT s.bucket,
      |  coalesce(n_base, 0) AS n_base, coalesce(n_curr, 0) AS n_curr,
      |  CAST(coalesce(n_base, 0) AS DOUBLE) / t_base AS p_base,
      |  CAST(coalesce(n_curr, 0) AS DOUBLE) / t_curr AS p_curr,
      |  CASE WHEN coalesce(n_base, 0) = 0 AND coalesce(n_curr, 0) = 0 THEN 0.0
      |    ELSE (CAST(coalesce(n_base, 0) AS DOUBLE) / t_base
      |            - CAST(coalesce(n_curr, 0) AS DOUBLE) / t_curr)
      |         * (CAST(coalesce(n_base, 0) AS DOUBLE) / t_base
      |            - CAST(coalesce(n_curr, 0) AS DOUBLE) / t_curr)
      |         / (CAST(coalesce(n_base, 0) AS DOUBLE) / t_base
      |            + CAST(coalesce(n_curr, 0) AS DOUBLE) / t_curr)
      |  END AS contrib
      |FROM s LEFT JOIN c ON s.bucket = c.bucket CROSS JOIN t
      |ORDER BY s.bucket""".stripMargin
}
