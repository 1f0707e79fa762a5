package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

class KnnSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted clusters: tight same-label neighborhoods vote unanimously") {
    // two tight clusters in 4-d, labels 0 and 1; queries are members
    def v(base: Float, i: Int): Seq[Float] =
      Seq(base + i * 0.01f, base, base, base)
    val emb = ((0 until 6).map(i => (i.toLong, v(1.0f, i), 0)) ++
      (6 until 12).map(i => (i.toLong, v(-1.0f, i), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Knn.knnPredict(emb).collect()
    assert(out.length == 12)
    out.foreach { r =>
      assert(r.getAs[Boolean]("correct"), s"mispredicted: $r")
      assert(r.getAs[Long]("n_votes") == 5L, s"non-unanimous: $r")
    }
  }

  test("fixture predictions: one row per query, votes bounded by k") {
    val out = Knn.qKnnPredict(spark, sf).cache()
    assert(out.count() == 50)
    assert(out.select(countDistinct(col("query_id"))).head().getLong(0) == 50)
    assert(out.filter(col("n_votes") < 1 || col("n_votes") > 5).count() == 0)
    // correct flag reconciles with the label comparison
    assert(out.filter(col("correct") =!=
      (col("pred_label") === col("true_label"))).count() == 0)
  }
}
