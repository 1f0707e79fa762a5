package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PCA projection of the embedding corpus — the trained linear
  * dimensionality reduction next to [[Rp]]'s oblivious one: center on
  * the sample mean, diagonalize the sample covariance, project every
  * vector onto the top-[[OutDims]] principal components.
  *
  * Training follows the sampled-quantizer discipline ([[Ivf]]/[[Pq]]):
  * a bounded xxhash64-ordered sample (≤ [[TrainSample]] rows regardless
  * of corpus size) is collected to the driver, where mean, covariance,
  * and a cyclic Jacobi eigendecomposition run in one fixed arithmetic
  * order — fully deterministic, cached per dataset, so the learned
  * components are literals the DuckDB twin inlines
  * ([[oracleEntries]], the trained-codebook oracle pattern).
  *
  * The projection itself is map-only: OutDims ordered-fold dots per row
  * (x·v − μ·v, with μ·v a precomputed scalar), codegen'd, zero
  * shuffles — at 100 TB it's a streaming pass that writes the 8-column
  * narrow table serving layers actually scan. Eigenvector signs are
  * normalized (largest-|component| positive) so the decomposition is
  * unique and reproducible.
  */
object Pca {

  val OutDims = 8
  val TrainSample = 2048

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed
    * (p,q) sweep order, fixed convergence threshold — deterministic.
    * Returns (eigenvalues, eigenvectors as rows), sorted by eigenvalue
    * descending, each vector sign-normalized. */
  def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 50, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = {
              val s = if (theta >= 0.0) 1.0 else -1.0
              s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { j =>
      val col = Array.tabulate(n)(i => v(i)(j))
      // sign convention: the largest-|x| component is positive
      val amax = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(amax) < 0.0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** (mean, eigenvalues, components): trained on the bounded sample in
    * one fixed order. */
  def train(emb: DataFrame): (Array[Double], Array[Double], Array[Array[Double]]) = {
    val rows = emb.select(col("embedding"))
      .orderBy(xxhash64(col("embedding"))).limit(TrainSample)
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = rows.length
    val d = rows.head.length
    val mean = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < n) { s += rows(i)(j); i += 1 }
      s / n
    }
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < n) {
      val x = rows(i)
      var p = 0
      while (p < d) {
        val xp = x(p) - mean(p)
        var q = p
        while (q < d) {
          cov(p)(q) += xp * (x(q) - mean(q))
          q += 1
        }
        p += 1
      }
      i += 1
    }
    var p = 0
    while (p < d) {
      var q = p
      while (q < d) {
        cov(p)(q) /= n
        cov(q)(p) = cov(p)(q)
        q += 1
      }
      p += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    (mean, vals, vecs)
  }

  private val models = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Double], Array[Double], Array[Array[Double]])]()

  def modelFor(dir: String, emb: => DataFrame): (Array[Double], Array[Double], Array[Array[Double]]) =
    models.computeIfAbsent(dir, _ => train(emb))

  /** μ·v per output component — precomputed once so the per-row work is
    * a single fold; the same ordered fold as the oracle's literal. */
  private def meanDots(mean: Array[Double], vecs: Array[Array[Double]]): Array[Double] =
    vecs.take(OutDims).map { v =>
      var s = 0.0; var i = 0
      while (i < mean.length) { s += mean(i) * v(i); i += 1 }
      s
    }

  /** Projection table: vec_id, label, pc1..pcOutDims. */
  def projectAll(emb: DataFrame, mean: Array[Double],
      vecs: Array[Array[Double]]): DataFrame = {
    val md = meanDots(mean, vecs)
    val pcs = (0 until OutDims).map { k =>
      (Similarity.dot(col("embedding"),
        array(vecs(k).map(lit).toIndexedSeq: _*)) - lit(md(k))).as(s"pc${k + 1}")
    }
    emb.select(col("vec_id") +: col("label") +: pcs: _*)
  }

  def qPcaProject(spark: SparkSession, dir: String): DataFrame = {
    val (mean, _, vecs) = modelFor(dir, Tables.embeddings(spark, dir))
    projectAll(Tables.embeddings(spark, dir), mean, vecs)
      .orderBy(col("vec_id"))
  }

  /** Generated twin: component literals + the μ·v scalar, dots as
    * sequential folds — bit-identical projections. Gated on exactly one
    * trained dataset (the [[Ivf.cachedCentroids]] rule).
    *
    * Two DuckDB subtleties this twin works around (measured, 1-ulp
    * each): a bare full-precision decimal literal lexes as
    * DECIMAL(20,19), whose →DOUBLE conversion is not correctly rounded,
    * so every learned double is emitted as CAST('…' AS DOUBLE) (string
    * parse IS correctly rounded); and list_sum is a blocked sum, not a
    * left fold, so the dot uses list_reduce — sequential by definition,
    * matching the kernel's accumulation order exactly. */
  def oracleEntries: Map[String, String] =
    if (models.size == 1) {
      val (mean, _, vecs) = models.values.iterator.next
      val md = meanDots(mean, vecs)
      def dlit(x: Double): String =
        s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
      val pcSql = (0 until OutDims).map { k =>
        val litArr = vecs(k).map(dlit).mkString("[", ", ", "]")
        s"list_reduce(list_transform(list_zip(embedding, $litArr), " +
          s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a, b) -> a + b) - " +
          s"${dlit(md(k))} AS pc${k + 1}"
      }.mkString(",\n       ")
      Map("embed_pca_project" ->
        s"""SELECT vec_id, label,
           |       $pcSql
           |FROM embeddings ORDER BY vec_id""".stripMargin)
    } else Map.empty
}
