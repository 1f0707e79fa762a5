package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Reciprocal-rank fusion of two retrieval legs — the standard hybrid-
  * search combiner (Cormack et al. 2009): each leg contributes
  * 1/(k + rank) for the documents it retrieved, so agreement between
  * legs beats a high score on either one, with NO score normalization
  * across legs (the whole point of fusing on ranks — BM25 scores and
  * term counts live on incomparable scales).
  *
  * Legs: BM25 top-20 ([[Retrieval.bm25TopK]], scores already hash-gated
  * engine-identical) and a raw term-frequency top-20 (exact integers).
  * Fusion is the integer surrogate ⌊10⁶/(60+rank)⌋ summed per doc —
  * ranks are integers, so the fused score is EXACT and the twin is a
  * plain hash gate; a leg that missed a doc contributes 0 (coalesce),
  * matching the RRF definition.
  *
  * Scale shape (100 TB): each leg reduces to a ≤ k-row pool before any
  * rank window runs (the windows order 20 rows — the single-partition
  * window is over a CONSTANT-sized table, not data); the fusion join is
  * pool×pool. At serving scale the legs swap onto their persisted-index
  * forms ([[Retrieval.bm25FromIndex]]) unchanged. */
object Fusion {

  val RrfK = 60
  val FusedK = 10
  private val RrfScale = 1000000L

  def hybridRrf(docs: DataFrame): DataFrame = {
    val wBm = Window.orderBy(col("score").desc, col("doc_id"))
    val bmPool = Retrieval.bm25TopK(docs)
      .withColumn("rank_bm25", row_number().over(wBm))
      .select(col("doc_id"), col("rank_bm25"))
    val tfCounts = docs
      .select(col("doc_id"), explode(TextFns.words(col("text"))).as("term"))
      .filter(col("term").isin(Retrieval.QueryTerms: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    val wTf = Window.orderBy(col("n_hits").desc, col("doc_id"))
    val tfPool = tfCounts
      .orderBy(col("n_hits").desc, col("doc_id")).limit(Retrieval.TopK)
      .withColumn("rank_tf", row_number().over(wTf))
      .select(col("doc_id"), col("rank_tf"))
    val wF = Window.orderBy(col("rrf_micro").desc, col("doc_id"))
    bmPool.join(tfPool, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"$RrfScale div ($RrfK + rank_bm25)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfK + rank_tf)"), lit(0L)))
      .withColumn("fused_rank", row_number().over(wF))
      .filter(col("fused_rank") <= FusedK)
      .select(col("doc_id"), col("rank_bm25"), col("rank_tf"),
        col("rrf_micro"), col("fused_rank"))
  }

  def qHybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(spark, dir)).orderBy(col("fused_rank"))

  def oHybridRrf: String = {
    val termList = Retrieval.QueryTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    raw"""WITH bm AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
      |      AS rank_bm25
      |  FROM (${Retrieval.oBm25TopK.replace("\n", "\n      |  ")}) AS bmq),
      |w AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |tfc AS (
      |  SELECT doc_id, count(*) AS n_hits FROM w
      |  WHERE list_contains($termList, term) GROUP BY 1),
      |tfpool AS (SELECT * FROM tfc ORDER BY n_hits DESC, doc_id LIMIT ${Retrieval.TopK}),
      |tfr AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY n_hits DESC, doc_id) AS INTEGER)
      |      AS rank_tf
      |  FROM tfpool),
      |f AS (
      |  SELECT coalesce(bm.doc_id, tfr.doc_id) AS doc_id, rank_bm25, rank_tf,
      |    CAST(coalesce($RrfScale // ($RrfK + rank_bm25), 0)
      |       + coalesce($RrfScale // ($RrfK + rank_tf), 0) AS BIGINT) AS rrf_micro
      |  FROM bm FULL OUTER JOIN tfr ON bm.doc_id = tfr.doc_id)
      |SELECT doc_id, rank_bm25, rank_tf, rrf_micro,
      |  CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS INTEGER)
      |    AS fused_rank
      |FROM f
      |QUALIFY fused_rank <= $FusedK
      |ORDER BY fused_rank""".stripMargin
  }
}
