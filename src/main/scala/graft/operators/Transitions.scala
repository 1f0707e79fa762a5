package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral transition matrix: per-user event streams folded into
  * first-order Markov transition counts and probabilities — the
  * session-analysis staple behind "what do users do after X" and the
  * input to next-event models. Probabilities are the exact integer
  * surrogate ⌊c(a→b)·1000 / c(a→·)⌋ (the idf/PMI discipline — no
  * data-ordered float sums anywhere).
  *
  * Scale shape (100 TB): one (user; ts, id) window shuffle for the lag
  * pairing, then a partial-agg count to the |types|² matrix — a
  * control-plane-sized result; the row-sum rejoin is a broadcast of
  * ≤|types| rows. Linear in events.
  */
object Transitions {

  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"),
      col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(rowTotals), Seq("from_type"))
      .withColumn("prob_milli",
        floor(col("n") * lit(1000L) / col("n_from")).cast("long"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        col("prob_milli"))
  }

  def qTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(Tables.events(spark, dir))
      .orderBy(col("from_type"), col("to_type"))

  def oTransitions: String =
    """WITH p AS (
      |  SELECT user_id, event_type AS to_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM p WHERE from_type IS NOT NULL
      |  GROUP BY from_type, to_type),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      |      FROM c GROUP BY from_type)
      |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n, t.n_from,
      |       CAST(floor(c.n * 1000 / t.n_from) AS BIGINT) AS prob_milli
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // ------------------------------------------------- IQR outlier fences

  /** Tukey outlier fences from EXACT quartiles: Q1/Q3 via
    * [[Scale.globalRank]] selection (rank ⌈p·n⌉ — no global sort, no
    * approx sketch), fences at 1.5·IQR, then one conditional-agg pass
    * counting per-type violations. The fence arithmetic is four double
    * ops in fixed order over two exactly-selected values — bit-stable
    * across engines. Complements [[Monitor.valueDrift]] (distribution
    * shift) and [[Temporal.rollingAnomalies]] (per-key time-local
    * spikes) with the classic whole-column robust-fence verdict. */
  def outlierFences(events: DataFrame, nPartitions: Int = 8): DataFrame = {
    val slim = events.select(col("event_id"), col("value"), col("event_type"))
    // n rides the rank's control plane — no separate count pass
    val (ranked, n) = Scale.globalRankWithTotal(
      slim.select(col("event_id"), col("value")),
      Seq(col("value"), col("event_id")), "rn", nPartitions)
    // both quartile rows in ONE pass over the (lazy, since r17) rank —
    // two filtered collects would re-run the whole rank pipeline twice
    val r1 = math.ceil(0.25 * n).toLong
    val r3 = math.ceil(0.75 * n).toLong
    val sel = ranked.filter(col("rn").isin(r1, r3))
      .select(col("rn"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q1 = sel(r1)
    val q3 = sel(r3)
    val lo = q1 - 1.5 * (q3 - q1)
    val hi = q3 + 1.5 * (q3 - q1)
    slim.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < lo, 1L).otherwise(0L)).as("n_below"),
        sum(when(col("value") > hi, 1L).otherwise(0L)).as("n_above"))
      .withColumn("fence_lo", lit(lo))
      .withColumn("fence_hi", lit(hi))
  }

  def qOutlierFences(spark: SparkSession, dir: String): DataFrame =
    outlierFences(Tables.events(spark, dir)).orderBy(col("event_type"))

  def oOutlierFences: String =
    """WITH s AS (
      |  SELECT value, row_number() OVER (ORDER BY value, event_id) AS rn
      |  FROM events),
      |nn AS (SELECT count(*) AS n FROM events),
      |q AS (
      |  SELECT
      |    (SELECT value FROM s, nn WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)) AS q1,
      |    (SELECT value FROM s, nn WHERE rn = CAST(ceil(0.75 * n) AS BIGINT)) AS q3),
      |f AS (SELECT q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
      |       lo AS fence_lo, hi AS fence_hi
      |FROM events, f GROUP BY event_type, lo, hi
      |ORDER BY event_type""".stripMargin
}
