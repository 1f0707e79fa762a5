package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact ROC AUC as a rank statistic — the classifier-evaluation
  * primitive next to [[Classify]]'s confusion matrix: AUC equals the
  * Mann–Whitney U probability P(score⁺ > score⁻) + ½·P(tie), computed
  * WITHOUT any pos×neg pair join via per-distinct-score tallies:
  * 2U = Σ_s pos_s · (2·negBelow_s + neg_s), all exact integers.
  *
  * Scale shape (100 TB): one partial-agg shuffle collapses the corpus
  * to ≤|score domain| rows; the ordered window then runs over DISTINCT
  * SCORES only — bounded by the domain, not the data (the
  * [[Quantiles]] discipline; a real-valued score would bucket through
  * [[Sketches.histQuantiles]]' grid first). Output is one row.
  */
object Auc {

  /** (n_pos, n_neg, u2 = 2·U, auc_milli = ⌊1000·U/(n_pos·n_neg)⌋) of
    * integer `score` predicting boolean `label`. */
  def rankAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.cast("long").as("s"),
        label.cast("int").cast("long").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos_s"),
        (count(lit(1)) - sum(col("y"))).as("neg_s"))
    val c = g.withColumn("cum_neg",
      sum(col("neg_s")).over(Window.orderBy(col("s"))))
    c.agg(sum(col("pos_s")).cast("long").as("n_pos"),
        sum(col("neg_s")).cast("long").as("n_neg"),
        sum(col("pos_s") * (lit(2L) * (col("cum_neg") - col("neg_s"))
          + col("neg_s"))).cast("long").as("u2"))
      // single-class input (n_pos·n_neg = 0) has no defined ranking AUC:
      // NULL in BOTH engines, not a Spark-NULL/DuckDB-error divergence
      // (ADVICE r10 — the prCurve ratio-guard discipline)
      .withColumn("auc_milli", expr(
        "CASE WHEN n_pos * n_neg = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE (u2 * 500) div (n_pos * n_neg) END"))
  }

  /** AUC of document length as an English-detector score — the honest
    * baseline an evaluation harness pins before trusting any learned
    * scorer (and the operator's deterministic fixture instance). */
  def qLengthAuc(spark: SparkSession, dir: String): DataFrame =
    rankAuc(Tables.documents(spark, dir), col("n_chars"), col("lang") === "en")

  /** Fixed decision thresholds for the precision/recall curve. */
  val PrThresholds = Seq(500L, 1000L, 2000L, 4000L, 8000L)

  /** Precision/recall at each threshold (predict positive iff
    * score ≥ t) — the operating-point table next to [[rankAuc]]'s
    * ranking summary, from ONE pass: the corpus collapses to
    * per-distinct-score (pos, neg) tallies (partial agg, domain-
    * bounded), thresholds join the SMALL tally table broadcast-side,
    * and all ratios are ⌊·1000⌋ integer surrogates. */
  def prCurve(df: DataFrame, score: Column, label: Column,
      thresholds: Seq[Long] = PrThresholds): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.select(score.cast("long").as("s"),
        label.cast("int").cast("long").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos_s"),
        (count(lit(1)) - sum(col("y"))).as("neg_s"))
    g.crossJoin(broadcast(thresholds.toDF("t")))
      .groupBy(col("t"))
      .agg(sum(when(col("s") >= col("t"), col("pos_s")).otherwise(0L))
          .cast("long").as("tp"),
        sum(when(col("s") >= col("t"), col("neg_s")).otherwise(0L))
          .cast("long").as("fp"),
        sum(when(col("s") < col("t"), col("pos_s")).otherwise(0L))
          .cast("long").as("fn"))
      .withColumn("precision_milli",
        expr("CASE WHEN tp + fp = 0 THEN 0L ELSE (tp * 1000) div (tp + fp) END"))
      .withColumn("recall_milli",
        expr("CASE WHEN tp + fn = 0 THEN 0L ELSE (tp * 1000) div (tp + fn) END"))
  }

  def qLengthPrCurve(spark: SparkSession, dir: String): DataFrame =
    prCurve(Tables.documents(spark, dir), col("n_chars"), col("lang") === "en")
      .orderBy(col("t"))

  def oLengthPrCurve: String =
    s"""WITH l AS (
      |  SELECT n_chars AS s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |g AS (
      |  SELECT s, CAST(sum(y) AS BIGINT) AS pos_s,
      |         CAST(count(*) - sum(y) AS BIGINT) AS neg_s
      |  FROM l GROUP BY s),
      |t AS (SELECT CAST(t AS BIGINT) AS t
      |      FROM (VALUES ${Auc.PrThresholds.map(t => s"($t)").mkString(", ")}) v(t)),
      |a AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN s >= t THEN pos_s ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN s >= t THEN neg_s ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN s < t THEN pos_s ELSE 0 END) AS BIGINT) AS fn
      |  FROM g, t GROUP BY t)
      |SELECT t, tp, fp, fn,
      |  CASE WHEN tp + fp = 0 THEN 0 ELSE (tp * 1000) // (tp + fp) END
      |    AS precision_milli,
      |  CASE WHEN tp + fn = 0 THEN 0 ELSE (tp * 1000) // (tp + fn) END
      |    AS recall_milli
      |FROM a ORDER BY t""".stripMargin

  def oLengthAuc: String =
    """WITH l AS (
      |  SELECT n_chars AS s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |g AS (
      |  SELECT s, CAST(sum(y) AS BIGINT) AS pos_s,
      |         CAST(count(*) - sum(y) AS BIGINT) AS neg_s
      |  FROM l GROUP BY s),
      |c AS (
      |  SELECT *, CAST(sum(neg_s) OVER (ORDER BY s) AS BIGINT) AS cum_neg
      |  FROM g),
      |t AS (
      |  SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
      |         CAST(sum(neg_s) AS BIGINT) AS n_neg,
      |         CAST(sum(pos_s * (2 * (cum_neg - neg_s) + neg_s)) AS BIGINT)
      |           AS u2
      |  FROM c)
      |SELECT n_pos, n_neg, u2,
      |  CASE WHEN n_pos * n_neg = 0 THEN CAST(NULL AS BIGINT)
      |       ELSE (u2 * 500) // (n_pos * n_neg) END AS auc_milli
      |FROM t""".stripMargin
}
