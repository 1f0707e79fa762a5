package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Random-projection (Johnson–Lindenstrauss) ANN: compress each
  * 64-dim embedding to [[RpDims]] Gaussian projections, find a coarse
  * top-[[CoarseM]] by dot product in the compressed space, then re-rank
  * only those candidates by exact full-dimension cosine. The JL lemma
  * bounds the coarse ranking's distortion; the exact re-rank confines
  * any coarse mistake to candidate SELECTION (recall), never to the
  * reported scores — the same two-stage contract as PQ's ADC + re-rank
  * ([[Pq]]), with a dense linear map instead of a trained codebook.
  *
  * Deterministic: seed-4242 planes are fixed literals (Java LCG is
  * specified), projections and coarse dots are ordered left folds, so
  * the DuckDB twin inlines the planes and reproduces every score and
  * rank bit-for-bit — a FULL hash gate despite "random" projections.
  *
  * Scale shape (100 TB): the projection is map-only (RpDims ordered
  * folds per row, codegen'd) and 8× narrower than the raw vectors —
  * the coarse pass streams 8 doubles/row instead of 64 floats; at real
  * scale the projected table is the thing you persist and scan
  * (column-pruned), touching full vectors only for the ≤ CoarseM
  * re-rank rows per query. Queries broadcast (nQueries ≪ corpus);
  * candidates never shuffle.
  */
object Rp {

  val RpDims = 16
  val CoarseM = 20
  val Seed = 4242

  /** Fixed Gaussian projection planes (deterministic across JVMs). */
  lazy val planes: Seq[Array[Double]] = {
    val rng = new scala.util.Random(Seed)
    Seq.fill(RpDims)(Array.fill(Similarity.Dims)(rng.nextGaussian()))
  }

  /** RpDims-element double array of plane dots over the L2-NORMALIZED
    * vector — JL preserves inner products of the vectors it sees, and
    * the target metric is cosine, i.e. the inner product of the
    * normalized vectors; projecting raw vectors would fold each side's
    * norm back into the coarse score as pure noise. */
  def project(emb: Column, nrm: Column): Column =
    array(planes.map { pl =>
      Similarity.dot(emb, array(pl.map(lit).toIndexedSeq: _*)) / nrm
    }: _*)

  /** Ordered left-fold dot of two projected (double) vectors through the
    * codegen'd kernel — same accumulation order as the twin's sequential
    * list_reduce (an interpreted zip_with/aggregate lambda here cost the
    * coarse pass 2.7 s at sf0.1; the kernel is the whole point of
    * [[graft.plans.DotProduct]]). */
  private def projDot(a: Column, b: Column): Column =
    Similarity.dot(a, b)

  /** Coarse top-m in projected space per query, exact cosine re-rank to
    * top-k. m = corpus − 1 makes the coarse stage vacuous and the result
    * exactly brute force (spec-pinned identity). */
  def rpTopK(emb: DataFrame, k: Int, nQueries: Int,
      m: Int = CoarseM): DataFrame = {
    val withNrm = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val base = withNrm.select(col("vec_id"), col("embedding"), col("nrm"),
      project(col("embedding"), col("nrm")).as("proj"))
    val q = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("proj").as("qp"), col("nrm").as("qn"))
    val c = base.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("proj").as("cp"), col("nrm").as("cn"))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("coarse", projDot(col("qp"), col("cp")))
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= m)
      .withColumn("cosine",
        Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  def qRpTopK(spark: SparkSession, dir: String): DataFrame =
    rpTopK(Tables.embeddings(spark, dir), k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank"))

  // ------------------------------------------------------- serving path

  /** Persist the projected table — the narrow artifact the coarse pass
    * scans at serving time: RpDims doubles + the norm per vector
    * instead of 64 floats. Built once per corpus (the
    * [[Pq.writeCodes]]/[[Retrieval.writeIndex]] amortization
    * discipline). */
  def writeProjections(emb: DataFrame, path: String): Unit = {
    val n = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    n.select(col("vec_id"), col("nrm"),
      project(col("embedding"), col("nrm")).as("proj"))
      .write.mode("overwrite").parquet(path)
  }

  /** Serve top-k from the persisted projections: the all-pairs coarse
    * stage touches ONLY the projected table; full vectors are read
    * late — one vec_id equi-join fetches the ≤ m·nQueries re-rank rows
    * (late materialization, the columnar-serving shape). Results are
    * identical to [[rpTopK]] by construction: same projections, same
    * fold, same windows — so it shares [[oRpTopK]]. */
  def rpTopKServing(spark: SparkSession, projPath: String, emb: DataFrame,
      k: Int, nQueries: Int, m: Int = CoarseM): DataFrame = {
    val proj = spark.read.parquet(projPath)
    val q = proj.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("proj").as("qp"),
        col("nrm").as("qn"))
    val c = proj.select(col("vec_id").as("neighbor_id"),
      col("proj").as("cp"), col("nrm").as("cn"))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val cand = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("coarse", projDot(col("qp"), col("cp")))
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= m)
      .select(col("query_id"), col("neighbor_id"), col("qn"), col("cn"))
    val vecs = emb.select(col("vec_id"), col("embedding"))
    cand
      .join(broadcast(vecs.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("embedding", "qe")), Seq("query_id"))
      .join(vecs.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("embedding", "ce"), Seq("neighbor_id"))
      .withColumn("cosine",
        Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Projection tables per dataset (build once, amortized;
    * collision-proof keying + staleness via [[graft.Serving]]). */
  private def projectionsFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("rp_proj", dir) { path =>
      writeProjections(Tables.embeddings(spark, dir), path)
    }

  def qRpTopKServing(spark: SparkSession, dir: String): DataFrame =
    rpTopKServing(spark, projectionsFor(spark, dir),
      Tables.embeddings(spark, dir), k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank"))

  /** One projection element as DuckDB SQL. The plane literals are
    * emitted as CAST('…' AS DOUBLE) (a bare full-precision decimal
    * lexes as DECIMAL(20,19) whose →DOUBLE conversion is off by an ulp;
    * the string parse is correctly rounded) and the fold is
    * list_reduce, which IS sequential — list_sum is a blocked sum that
    * drifts an ulp on mixed-precision products (both measured; see
    * [[Pca.oracleEntries]]). */
  private def projElemSql(embCol: String, plane: Array[Double]): String = {
    val litArr = plane
      .map(x => s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"(list_reduce(list_transform(list_zip($embCol, $litArr), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a, b) -> a + b) / nrm)"
  }

  def oRpTopK: String = {
    val projSql = planes.map(p => projElemSql("embedding", p))
      .mkString("[", ", ", "]")
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id, embedding, nrm, $projSql AS proj
       |  FROM n),
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    q.embedding AS qe, c.embedding AS ce, q.nrm AS qn, c.nrm AS cn,
       |    list_reduce(list_transform(list_zip(q.proj, c.proj),
       |      x -> x[1] * x[2]), (a, b) -> a + b) AS coarse
       |  FROM b q JOIN b c ON q.vec_id < 50 AND c.vec_id != q.vec_id),
       |coarse_ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crank
       |  FROM pairs),
       |rerank AS (
       |  SELECT query_id, neighbor_id,
       |    list_sum(list_transform(list_zip(qe, ce),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (qn * cn) AS cosine
       |  FROM coarse_ranked WHERE crank <= $CoarseM)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM rerank)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }
}
