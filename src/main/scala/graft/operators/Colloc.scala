package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Collocation mining: rank adjacent word bigrams by a PMI surrogate —
  * association strength, not raw frequency (the ranking
  * [[TextAnalysis.topNgrams]]'s counts can't express: "of the" counts
  * high but associates weakly; a name's two halves count low but
  * associate strongly). PMI = log P(ab)/(P(a)P(b)); log is monotone, so
  * ranking by the RATIO is ranking by PMI, and the ratio is computed as
  * the exact integer surrogate ⌊c(ab)·N·1000 / (c(a)·c(b))⌋ — the
  * [[TextAnalysis]] idf-surrogate discipline that keeps both engines
  * bit-exact with no libm anywhere. A minimum pair count screens out
  * the unstable one-off pairs PMI notoriously over-ranks.
  *
  * Scale shape (100 TB): unigram and bigram counts are partial-agg
  * shuffles on the token (vocabulary-sized results); the two unigram
  * lookups broadcast back onto the bigram table; top-k is
  * TakeOrdered(20). N (total words) is a 1-row broadcast scalar. At
  * trillion-token scale the ·N·1000 product needs DECIMAL(38) headroom
  * — noted where it's built.
  */
object Colloc {

  val MinPairCount = 5
  val TopK = 20

  def pmiBigrams(docs: DataFrame, minCount: Int = MinPairCount,
      k: Int = TopK): DataFrame = {
    val ws = docs.select(col("doc_id"), TextFns.words(col("text")).as("ws"))
    val uni = ws.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val big = ws
      .select(col("ws"), explode(when(size(col("ws")) > 1,
        sequence(lit(0), size(col("ws")) - 2))
        .otherwise(array().cast("array<int>"))).as("i"))
      .select(element_at(col("ws"), col("i") + 1).as("a"),
        element_at(col("ws"), col("i") + 2).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val nWords = uni.agg(sum(col("c")).as("n_words"))
    // c(ab)·N·1000 ≤ 4·10¹⁴ at sf0.1 — bigint; DECIMAL(38,0) at real scale
    big
      .join(broadcast(uni.select(col("w").as("a"), col("c").as("c_a"))), Seq("a"))
      .join(broadcast(uni.select(col("w").as("b"), col("c").as("c_b"))), Seq("b"))
      .crossJoin(broadcast(nWords))
      .withColumn("pmi_score",
        floor(col("c_ab") * col("n_words") * lit(1000L) /
          (col("c_a") * col("c_b"))).cast("long"))
      .select(concat_ws(" ", col("a"), col("b")).as("bigram"),
        col("c_ab"), col("c_a"), col("c_b"), col("pmi_score"))
      .orderBy(col("pmi_score").desc, col("bigram"))
      .limit(k)
  }

  def qPmiBigrams(spark: SparkSession, dir: String): DataFrame =
    pmiBigrams(Tables.documents(spark, dir))

  def oPmiBigrams: String =
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS i, ws[i+1] AS word, len(ws) AS n
      |  FROM w, unnest(range(0, len(ws))) AS t(i)),
      |uni AS (SELECT word AS t, count(*) AS c FROM tok GROUP BY word),
      |nw AS (SELECT CAST(sum(c) AS BIGINT) AS n_words FROM uni),
      |big AS (
      |  SELECT ws[i+1] AS a, ws[i+2] AS b, count(*) AS c_ab
      |  FROM w, unnest(range(0, greatest(len(ws) - 1, 0))) AS t(i)
      |  GROUP BY 1, 2
      |  HAVING count(*) >= $MinPairCount)
      |SELECT concat(a, ' ', b) AS bigram,
      |       CAST(c_ab AS BIGINT) AS c_ab,
      |       CAST(ua.c AS BIGINT) AS c_a, CAST(ub.c AS BIGINT) AS c_b,
      |       CAST(floor(c_ab * n_words * 1000 / (ua.c * ub.c)) AS BIGINT)
      |         AS pmi_score
      |FROM big JOIN uni ua ON big.a = ua.t
      |         JOIN uni ub ON big.b = ub.t, nw
      |ORDER BY pmi_score DESC, bigram LIMIT $TopK""".stripMargin
}
