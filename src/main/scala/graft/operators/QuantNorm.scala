package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Quantile normalization across sources — map every source's value
  * distribution onto the GLOBAL distribution so per-source scale and
  * shift artifacts vanish while each source's internal ordering is
  * preserved: a doc at its source's p-th quantile receives the global
  * p-th-quantile value. The cross-source feature-alignment step (the
  * microarray-normalization classic, applied to corpus features) that
  * makes per-source length/quality features comparable before mixing.
  *
  * Exactness: both ranks are integers with pinned tie-breaks
  * (value, doc_id), the quantile map is the exact integer
  * `⌈r·N/n_s⌉ = (r·N + n_s − 1) div n_s`, and the normalized value is
  * a rank-selection JOIN against the globally ranked table — no
  * interpolation, no floats.
  *
  * Scale shape (100 TB): a corpus has a HANDFUL of sources, so
  * within-source ranks ride [[Scale.globalRankGrouped]] (range
  * partition + per-group offsets — max task one range partition, never
  * 1/|sources| of the corpus) with source sizes from a hash aggregate;
  * the plain source-partitioned window survives behind the
  * [[Scale.hotGroups]] dial for high-cardinality grouping. The global
  * rank is [[Scale.globalRank]] (same offset pattern, ungrouped); the
  * map itself is an equi-join on rank. */
object QuantNorm {

  def quantileNormalize(docs: DataFrame,
      hotGroupsOverride: Option[Boolean] = None): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val hot = hotGroupsOverride.getOrElse(Scale.hotGroups(base, Seq("source")))
    val ranked = if (hot) {
      // source sizes ride the collected offsets — no extra agg pass
      Scale.globalRankGrouped(base, Seq("source"),
        Seq(col("n_chars"), col("doc_id")), "r", totalOut = Some("n_s"))
    } else {
      val ws = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      base
        .withColumn("r", row_number().over(ws).cast("long"))
        .withColumn("n_s",
          count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
    }
    val globalRanked = Scale.globalRank(base,
        Seq(col("n_chars"), col("doc_id")), "g_rank", 32)
      .select(col("g_rank"), col("n_chars").as("norm_chars"))
    val total = globalRanked.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(total))
      .withColumn("g_rank", expr("(r * nn + n_s - 1) div n_s"))
      .join(globalRanked, Seq("g_rank"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("norm_chars"))
  }

  def qQuantileNormalize(spark: SparkSession, dir: String): DataFrame =
    quantileNormalize(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  def oQuantileNormalize: String =
    """WITH b AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
      |  FROM b),
      |g AS (
      |  SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |      AS g_rank,
      |    n_chars AS norm_chars
      |  FROM b),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b)
      |SELECT r.doc_id, r.source, r.n_chars, g.norm_chars
      |FROM r, n
      |JOIN g ON g.g_rank = (r.r * n.nn + r.n_s - 1) // r.n_s
      |ORDER BY r.doc_id""".stripMargin
}
