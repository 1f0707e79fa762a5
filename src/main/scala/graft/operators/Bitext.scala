package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-lingual document alignment — bitext mining (the CCMatrix /
  * LASER recipe, re-expressed Spark-first): for every non-pivot-language
  * document, the best pivot-language neighbor in embedding space, plus
  * the top-1-vs-top-2 MARGIN (the score bitext miners actually
  * threshold on: a translation is not just close to its counterpart,
  * it is close to it and far from everything else).
  *
  * Scale shape: candidates come from the deterministic sign-LSH blocks
  * (multi-probe Hamming-1 — the [[Dedup.semanticContamination]]
  * machinery with language in place of split), so only cross-language
  * pairs inside a colliding block are ever scored: pivot×pivot and
  * nonpivot×nonpivot pairs are never generated, and the join shuffles
  * on bucket ids, never n². The per-query window is rank-limited
  * (WindowGroupLimit) and bounded by the doc's block collisions.
  *
  * Determinism: cosines ride the fused sequential-fold kernel
  * (bit-identical to DuckDB's list_sum fold); the margin is one IEEE
  * subtraction of two such cosines — hash-gateable end to end. */
object Bitext {

  val PivotLang = "en"
  val AlignThreshold = 0.25

  def crossLingualAlign(emb: DataFrame, docs: DataFrame,
      pivot: String = PivotLang,
      threshold: Double = AlignThreshold): DataFrame = {
    val withLang = emb.join(
      docs.select(col("doc_id").as("vec_id"), col("lang")), Seq("vec_id"))
      .withColumn("bucket", Similarity.lshBucket(col("embedding")))
    val probes = array((lit(0L) +: (0 until Similarity.Planes)
      .map(p => lit(1L << p))): _*)
    val q = withLang.filter(col("lang") =!= pivot)
      .select(col("vec_id").as("doc_id"), col("lang"),
        col("embedding").as("eq"), col("bucket"))
      .withColumn("probe",
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))))
    val t = withLang.filter(col("lang") === pivot)
      .select(col("vec_id").as("pivot_id"), col("embedding").as("ep"),
        col("bucket").as("probe"))
    // query probes are 1+Planes distinct values and a pivot doc holds one
    // bucket ⇒ a pair matches at most once — no post-join dedup
    val hits = q.join(t, Seq("probe"))
      .withColumn("cosine",
        graft.plans.CosineSimilarity.cosineSim(col("eq"), col("ep")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cosine").desc, col("pivot_id"))
    hits.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy(col("doc_id"), col("lang"))
      .agg(max(when(col("rn") === 1, col("pivot_id"))).as("pivot_id"),
        max(when(col("rn") === 1, col("cosine"))).as("cosine"),
        max(when(col("rn") === 2, col("cosine"))).as("cos2"))
      // margin is only meaningful with TWO candidates: a doc whose LSH
      // blocks yielded a single pivot would get margin = cosine — the
      // signal largest exactly where candidate recall is weakest, so a
      // lone mediocre neighbor would look confidently unique to any
      // downstream margin threshold (ADVICE r13). Single-candidate
      // rows carry a NULL margin instead; consumers thresholding on
      // margin skip them, consumers thresholding on cosine still see
      // the pair.
      .withColumn("margin",
        when(col("cos2").isNotNull, col("cosine") - col("cos2")))
      .filter(col("cosine") >= threshold)
      .select(col("doc_id"), col("lang"), col("pivot_id"), col("cosine"),
        col("margin"))
  }

  def qCrossLingualAlign(spark: SparkSession, dir: String): DataFrame =
    crossLingualAlign(Tables.embeddings(spark, dir),
      Tables.documents(spark, dir))
      .orderBy(col("doc_id"))

  /** Twin: same plane literals, cross-language probe join, sequential-
    * fold cosine, rank-2 window, and the NULL-propagating margin
    * subtraction (single-candidate rows carry NULL margin). */
  def oCrossLingualAlign: String =
    s"""WITH n AS (
       |  SELECT vec_id, lang, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
       |    ${Similarity.bucketSql("embedding")} AS bucket
       |  FROM embeddings JOIN documents ON doc_id = vec_id),
       |q AS (
       |  SELECT vec_id AS doc_id, lang, embedding AS eq, nrm AS nq,
       |    xor(bucket, m) AS probe
       |  FROM n, (SELECT unnest(${Similarity.probeMasksSql}) AS m)
       |  WHERE lang != '$PivotLang'),
       |t AS (
       |  SELECT vec_id AS pivot_id, embedding AS ep, nrm AS np,
       |    bucket AS probe
       |  FROM n WHERE lang = '$PivotLang'),
       |h AS (
       |  SELECT doc_id, lang, pivot_id,
       |    list_sum(list_transform(list_zip(eq, ep),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (nq * np) AS cosine
       |  FROM q JOIN t USING (probe)),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cosine DESC, pivot_id) AS rn
       |  FROM h),
       |p AS (
       |  SELECT doc_id, lang,
       |    max(CASE WHEN rn = 1 THEN pivot_id END) AS pivot_id,
       |    max(CASE WHEN rn = 1 THEN cosine END) AS cosine,
       |    max(CASE WHEN rn = 2 THEN cosine END) AS cos2
       |  FROM r WHERE rn <= 2 GROUP BY doc_id, lang)
       |SELECT doc_id, lang, pivot_id, cosine,
       |  cosine - cos2 AS margin
       |FROM p WHERE cosine >= $AlignThreshold
       |ORDER BY doc_id""".stripMargin
}
