package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** k-NN label prediction over the embedding space — the zero-training
  * classifier every vector store gets for free, and the standard
  * label-noise probe (a vector whose own label loses its neighborhood
  * vote is a mislabel candidate). Completes the ML-evaluation family
  * next to the NB classifier's confusion matrix.
  *
  * Deterministic end to end: neighbors come from the hash-gated
  * [[Similarity.bruteForceTopK]] (kernel-exact cosines, pinned
  * tie-breaks), votes are integers, and the winning label is
  * (votes DESC, label ASC) — a total order.
  *
  * Scale shape (100 TB): voting is a ≤ k·#queries-row aggregate on top
  * of whatever neighbor source is plugged in — at scale the brute-force
  * leg swaps for the IVF/PQ serving paths unchanged, which is the point
  * of keeping the vote separate from retrieval. */
object Knn {

  val K = 5
  val NQueries = 50

  def knnPredict(emb: DataFrame): DataFrame = {
    val neighbors = Similarity.bruteForceTopK(emb, K, NQueries)
    val votes = neighbors
      .groupBy(col("query_id"), col("neighbor_label").as("pred_label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("pred_label"))
    val winners = votes.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1).drop("rnk")
    winners
      .join(emb.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), Seq("query_id"))
      .withColumn("correct", col("pred_label") === col("true_label"))
      .select(col("query_id"), col("true_label"), col("pred_label"),
        col("n_votes"), col("correct"))
  }

  def qKnnPredict(spark: SparkSession, dir: String): DataFrame =
    knnPredict(Tables.embeddings(spark, dir)).orderBy(col("query_id"))

  /** Twin: the existing top-k oracle as a subquery, the same integer
    * vote, the same total-order winner. */
  def oKnnPredict: String =
    s"""WITH nb AS (
      |  SELECT * FROM (${Similarity.oCosineTopK.replace("\n", "\n      |  ")}) AS t),
      |v AS (
      |  SELECT query_id, neighbor_label AS pred_label,
      |    CAST(count(*) AS BIGINT) AS n_votes
      |  FROM nb GROUP BY 1, 2),
      |wn AS (
      |  SELECT query_id, pred_label, n_votes,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY n_votes DESC, pred_label) AS rnk
      |  FROM v)
      |SELECT wn.query_id, e.label AS true_label, wn.pred_label, wn.n_votes,
      |  wn.pred_label = e.label AS correct
      |FROM wn JOIN embeddings e ON e.vec_id = wn.query_id
      |WHERE wn.rnk = 1 ORDER BY wn.query_id""".stripMargin
}
