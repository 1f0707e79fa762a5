package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pca, Rp, Similarity}

/** Random-projection ANN identity/recall and PCA decomposition
  * properties. */
class RpPcaSpec extends SparkSpecBase {

  test("rp with m = corpus-1 is exactly brute force") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    val rp = Rp.rpTopK(emb, k = 5, nQueries = 20, m = n - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bf = Similarity.bruteForceTopK(emb, k = 5, nQueries = 20)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rp == bf)
  }

  test("rp coarse stage keeps usable recall at the default width") {
    val emb = Tables.embeddings(spark, sf)
    val rp = Rp.rpTopK(emb, k = 5, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(emb, k = 5, nQueries = 50)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = rp.intersect(bf).size.toDouble / bf.size
    info(f"rp recall@5 = $recall%.3f")
    // fixture embeddings are unclustered noise (see LlmOpsSpec's LSH/IVF
    // recall tests), so absolute recall is modest by construction; the
    // JL claim is lift over the scanned fraction: the coarse stage scans
    // CoarseM of n−1 candidates (4%), measured recall ≈ 0.25 — a 6×
    // lift. Pin comfortably above the scan fraction, below the measure.
    val scanned = Rp.CoarseM.toDouble / (emb.count() - 1)
    assert(recall > scanned + 0.1, f"recall $recall%.3f vs scanned $scanned%.3f")
    // every reported score is an exact cosine: reported pairs common with
    // brute force carry identical scores
    val rpScores = Rp.rpTopK(emb, k = 5, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bfScores = Similarity.bruteForceTopK(emb, k = 5, nQueries = 50)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rpScores.keySet.intersect(bfScores.keySet).foreach { p =>
      assert(rpScores(p) == bfScores(p))
    }
  }

  test("rp serving path equals the inline path row-for-row") {
    val a = graft.operators.Rp.qRpTopK(spark, sf)
      .collect().map(_.toString).toSeq
    val b = graft.operators.Rp.qRpTopKServing(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("jacobi solves a known symmetric matrix") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // sign convention: largest-|x| component positive
    assert(vecs(1)(0) > 0 || vecs(1)(1) > 0)
  }

  test("trained components are orthonormal and preserve total variance") {
    val (_, vals, vecs) = Pca.train(Tables.embeddings(spark, sf))
    val d = vecs.length
    for (i <- 0 until d; j <- i until d) {
      val dot = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"($i,$j) -> $dot")
    }
    // eigenvalues sorted descending, non-negative (covariance is PSD)
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    assert(vals.forall(_ > -1e-12))
    // a second train run is bit-identical (deterministic training)
    val (_, vals2, vecs2) = Pca.train(Tables.embeddings(spark, sf))
    assert(vals.sameElements(vals2))
    assert(vecs.zip(vecs2).forall { case (a, b) => a.sameElements(b) })
  }

  test("projection decorrelates: sample variances follow eigenvalue order") {
    val emb = Tables.embeddings(spark, sf)
    val (mean, vals, vecs) = Pca.modelFor(sf, emb)
    val proj = Pca.projectAll(emb, mean, vecs)
    val stats = proj.select(
      (1 to Pca.OutDims).map(k => var_pop(col(s"pc$k")).as(s"v$k")): _*)
      .collect().head
    val vars = (0 until Pca.OutDims).map(stats.getDouble)
    // the corpus isn't the training sample, so allow slack: top component
    // should still dominate the last
    assert(vars.head > vars.last)
    // and projected variances should be in the ballpark of eigenvalues
    vars.zip(vals.take(Pca.OutDims)).foreach { case (v, l) =>
      assert(v > 0.2 * l && v < 5.0 * l, s"var $v vs eigenvalue $l")
    }
  }
}
