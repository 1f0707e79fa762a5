package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Weighted corpus sampling — Bernoulli inclusion with probability
  * proportional to document size, plus the inverse-probability weight
  * (Horvitz-Thompson) column downstream estimators need to stay
  * unbiased. The curation use: build a cheap pilot corpus whose token
  * statistics estimate the full corpus's, without the uniform-sample
  * bias toward short documents.
  *
  * Inclusion is INTEGER-EXACT and stateless: doc d with w(d) words is
  * kept iff md5u56(doc_id) mod (Cap·100) < min(w, Cap)·RatePct — i.e.
  * p(d) = RatePct·min(w, Cap) / (100·Cap), capped so no document
  * exceeds RatePct/100. No RNG, no libm: the decision replays
  * identically in any engine ([[TextFns.md5u56]]'s discipline), re-runs
  * are idempotent, and the sample is auditable row-by-row. The ipw
  * column is one exactly-rounded IEEE division of two integers, so the
  * full output carries a DuckDB hash gate.
  *
  * Scale shape (100 TB): map-only — a projection and a filter on the
  * scan, zero shuffles; at 1000 executors every partition samples
  * independently (the hash needs no coordination, unlike a reservoir).
  */
object Sampling {

  /** Per-doc probability cap denominator: documents at or above `Cap`
    * words get the full `RatePct`% inclusion probability. */
  val Cap = 200L
  val RatePct = 30L

  def weightedSample(docs: DataFrame, cap: Long = Cap,
      ratePct: Long = RatePct): DataFrame = {
    val w = least(size(TextFns.words(col("text"))).cast("long"), lit(cap))
    val u = pmod(TextFns.md5u56(col("doc_id").cast("string")), lit(cap * 100L))
    docs
      .withColumn("n_words", w)
      .withColumn("u", u)
      .filter(col("u") < col("n_words") * ratePct)
      .withColumn("ipw",
        lit((cap * 100L).toDouble) / (col("n_words") * ratePct).cast("double"))
      .select(col("doc_id"), col("n_words"), col("ipw"))
  }

  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir)).orderBy("doc_id")

  val oWeightedSample: String = {
    val h = TextFns.md5u56Sql("CAST(doc_id AS VARCHAR)")
    raw"""WITH d AS (
      |  SELECT doc_id,
      |    least(CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT),
      |          $Cap) AS n_words,
      |    $h % ${Cap * 100L} AS u
      |  FROM documents)
      |SELECT doc_id, n_words,
      |  ${(Cap * 100L).toDouble} / CAST(n_words * $RatePct AS DOUBLE) AS ipw
      |FROM d WHERE u < n_words * $RatePct
      |ORDER BY doc_id""".stripMargin
  }
}
