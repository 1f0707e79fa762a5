package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exponentially-weighted moving average as an EXACT integer lag
  * polynomial — the adaptive-baseline smoother behind "is today's
  * volume anomalous?" monitoring (CUSUM's cousin: CUSUM accumulates
  * drift, EWMA tracks the level and flags spikes against it).
  *
  * The textbook recursive EWMA (s_t = αx_t + (1−α)s_{t−1}) carries
  * floating-point state that no hash gate can cross engines with, and
  * an infinite tail no window can bound. This operator instead uses the
  * bounded-window form with α = 1/8 over the last [[Terms]] points:
  * weights w_i = 7^i·8^(Terms−1−i) for lag i (largest weight on the
  * newest point), all BIGINT, so the weighted sum is exact integer
  * arithmetic and Σw = 8^Terms − 7^Terms ([[WeightSum]], the geometric
  * telescoping). The smoothed level is emitted in fixed-point permille
  * via floor division; rows whose lookback window is incomplete emit
  * NULL (the + chain propagates the missing lag) rather than a
  * partially-weighted estimate — both engines agree because the null
  * algebra is the same.
  *
  * Scale shape: one hash aggregate to the (entity, day) grain, then a
  * window PARTITIONED BY the entity — lag state never crosses keys, so
  * the operator parallelizes to however many entities exist; no global
  * sort, no driver state. All expressions codegen (lag + integer
  * multiply-add). */
object Ewma {

  /** Lookback depth. 8 terms of (7/8)^i hold ~66% of the infinite
    * EWMA's mass; the remainder is the price of exactness. */
  val Terms = 8

  /** w_i = 7^i · 8^(Terms−1−i), i = 0 (current) … Terms−1 (oldest lag). */
  def weight(i: Int): Long = {
    require(i >= 0 && i < Terms)
    var w = 1L
    for (_ <- 0 until i) w *= 7L
    for (_ <- 0 until (Terms - 1 - i)) w *= 8L
    w
  }

  /** Σ w_i = 8^Terms − 7^Terms. */
  val WeightSum: Long = (0 until Terms).map(weight).sum

  /** Spike multiple: flag when today's count exceeds 2× the smoothed
    * level, compared in cross-multiplied integers (no division). */
  val SpikeNum = 2L

  /** Daily event volume per type with its EWMA baseline and spike flag.
    * Columns: event_type, d, c (day count), ewma_milli (fixed-point
    * milli-count, NULL until the lookback fills), spike (1/0, NULL with
    * the baseline). */
  def qEwmaDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val wsum = (0 until Terms).map { i =>
      (if (i == 0) col("c") else lag(col("c"), i).over(w)) * lit(weight(i))
    }.reduce(_ + _)
    daily
      .withColumn("_wsum", wsum)
      .withColumn("ewma_milli", expr(s"(_wsum * 1000) div $WeightSum"))
      .withColumn("spike",
        when(col("_wsum").isNull, lit(null).cast("int"))
          .otherwise((col("c") * lit(WeightSum) >
            lit(SpikeNum) * col("_wsum")).cast("int")))
      .select(col("event_type"), col("d"), col("c"), col("ewma_milli"),
        col("spike"))
      .orderBy(col("event_type"), col("d"))
  }

  /** Twin: identical lag polynomial (`//` = the same floor division;
    * NULL lags propagate through + identically). */
  def oEwmaDaily: String = {
    val terms = (0 until Terms).map { i =>
      val src = if (i == 0) "c"
        else s"lag(c, $i) OVER (PARTITION BY event_type ORDER BY d)"
      s"$src * ${weight(i)}"
    }.mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |sm AS (
       |  SELECT event_type, d, c, $terms AS wsum FROM daily)
       |SELECT event_type, d, c,
       |  CAST((wsum * 1000) // $WeightSum AS BIGINT) AS ewma_milli,
       |  CASE WHEN wsum IS NULL THEN NULL
       |       WHEN c * $WeightSum > $SpikeNum * wsum THEN 1 ELSE 0 END AS spike
       |FROM sm ORDER BY event_type, d""".stripMargin
  }
}
