package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Symmetric per-vector int8 scalar quantization of embeddings — the
  * standard 4× memory/bandwidth compression an embedding store applies
  * before ANN serving (reference stores raw float vectors:
  * embeddings.parquet per TESTDATA.md; int8 is the first compression
  * tier, PQ ([[Pq]]) the second).
  *
  * Code `qᵢ = round(xᵢ / scale)` with `scale = max|x| / 127`, so codes
  * span the full [−127, 127] range and at least one element saturates by
  * construction. Everything downstream of the codes is DETERMINISTIC:
  * scale is a max (order-independent), round is IEEE-double round-half-
  * away-from-zero in both engines, and the reconstruction `qᵢ·scale`
  * reproduces identical double bits — so both the diagnostics query and
  * the quantized-domain top-k carry full DuckDB hash gates, unlike the
  * sampled-k-means paths (PQ/IVF) that are approximate by construction.
  *
  * Scale shape (100 TB): quantization is map-only (one scan, zero
  * shuffles); the serving top-k below re-derives dequantized vectors to
  * keep the oracle twin exact, but a deployment stores the int8 codes +
  * scale (4.1× smaller than float32) and scans those — the scan cost,
  * not the arithmetic, is what the compression buys back.
  */
object Quant {

  /** Half-range of the int8 code domain. */
  val Levels = 127

  /** Projection boundary after each derived column so the lambdas below
    * see a bound attribute, not an inlined aggregate re-evaluated per
    * element (the trap [[TextAnalysis]] documents for winnowing). */
  private def withScale(emb: DataFrame, carry: String*): DataFrame = {
    val kept = carry.map(col)
    emb
      .select(col("vec_id") +: kept :+
        transform(col("embedding"), v => v.cast("double")).as("xd"): _*)
      .select(col("vec_id") +: kept :+ col("xd") :+
        (array_max(transform(col("xd"), v => abs(v))) / Levels.toDouble)
          .as("scale"): _*)
  }

  /** `round(v/scale)·scale` — the reconstructed (dequantized) element.
    * Guarded for the all-zero vector (scale 0 → reconstruct 0). */
  private def deq(v: Column, scale: Column): Column =
    when(scale === 0d, lit(0d)).otherwise(round(v / scale) * scale)

  /** Per-vector quantization diagnostics: the scale, the ∞-norm
    * reconstruction error, and how many elements saturate at ±127.
    * Max/count reductions only — order-independent, so double-bit-exact
    * against [[oQuantizeStats]]. */
  def quantizeStats(emb: DataFrame): DataFrame =
    withScale(emb)
      .select(col("vec_id"), col("scale"),
        array_max(transform(col("xd"),
          v => abs(v - deq(v, col("scale"))))).as("max_err"),
        size(filter(col("xd"), v =>
          when(col("scale") === 0d, lit(false))
            .otherwise(abs(round(v / col("scale"))) === Levels.toDouble)))
          .cast("long").as("n_sat"))

  def qQuantizeStats(spark: SparkSession, dir: String): DataFrame =
    quantizeStats(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  def oQuantizeStats: String =
    s"""WITH x AS (
       |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
       |  FROM embeddings),
       |s AS (
       |  SELECT vec_id, xd,
       |         list_max(list_transform(xd, v -> abs(v))) / $Levels.0 AS scale
       |  FROM x)
       |SELECT vec_id, scale,
       |  list_max(list_transform(xd, v -> abs(v -
       |    CASE WHEN scale = 0 THEN 0 ELSE round(v/scale)*scale END))) AS max_err,
       |  CAST(len(list_filter(xd, v -> CASE WHEN scale = 0 THEN false
       |    ELSE abs(round(v/scale)) = $Levels.0 END)) AS BIGINT) AS n_sat
       |FROM s ORDER BY vec_id""".stripMargin

  /** Cosine top-k in the quantized domain: every vector replaced by its
    * int8 reconstruction, then the same broadcast-queries × corpus scan
    * + per-query window as [[Similarity.bruteForceTopK]], scored through
    * the native fused dot kernel. Approximate vs the float top-k (recall
    * is property-tested), but exactly reproducible — the oracle twin
    * rebuilds identical dequantized bits. */
  /** The reconstructed corpus as the interpreted HOF composition — kept
    * as the bit-exactness twin of the native kernel (spec-pinned equal),
    * the same role the zip_with cosine plays for [[graft.plans.DotProduct]]. */
  private[graft] def reconstructComposed(emb: DataFrame): DataFrame =
    withScale(emb, "label")
      .select(col("vec_id"), col("label"),
        transform(col("xd"), v => deq(v, col("scale"))).as("de"))

  /** One fused native pass: maxabs → scale → round-reconstruct
    * ([[graft.plans.QuantReconstruct]]); replaces three interpreted
    * lambdas per corpus row. */
  private[graft] def reconstructNative(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      graft.plans.QuantReconstruct.reconstructNative(col("embedding")).as("de"))

  def quantizedTopK(emb: DataFrame, k: Int, nQueries: Int): DataFrame = {
    val dq = reconstructNative(emb)
      .withColumn("nrm", Similarity.norm(col("de")))
    val q = dq.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("de").as("qe"), col("nrm").as("qn"))
    val c = dq.select(col("vec_id").as("neighbor_id"), col("de").as("ce"),
      col("nrm").as("cn"), col("label").as("neighbor_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        col("cosine"), col("rank"))
  }

  def qQuantizedTopK(spark: SparkSession, dir: String): DataFrame =
    quantizedTopK(Tables.embeddings(spark, dir), k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank"))

  // ---------------------------------------------------------------- int8 serving

  /** The persisted int8 SERVING layout: each embedding stored as a
    * `dim`-byte binary code vector plus its precomputed code-domain norm
    * — 4× smaller than float32 on disk and on every scan. This is the
    * table a deployment writes once and serves from; [[int8TopK]] reads
    * it. One map-only pass ([[graft.plans.Int8Vec.Int8Codes]] fuses
    * maxabs → scale → round into a single codegen'd loop). */
  def int8ServingTable(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        graft.plans.Int8Vec.codes(col("embedding")).as("codes"))
      .withColumn("code_norm",
        sqrt(graft.plans.Int8Vec.dot(col("codes"), col("codes")).cast("double")))

  /** Cosine top-k served PURELY from int8 codes: with symmetric
    * quantization `x ≈ s·q` the scales cancel in cosine, so ranking
    * needs only integer code dots — never a dequantized float vector.
    * Same ranking as [[quantizedTopK]] up to fp association (spec-pinned
    * equal on the fixture); 4× less scan bandwidth and integer multiply-
    * adds in the hot loop. Every arithmetic step is exact or singly
    * rounded (integer dot ≤ 127²·d is an exact long; sqrt/mul/div are
    * single IEEE ops), so the result is deterministic and carries a full
    * DuckDB hash gate ([[oInt8TopK]]). */
  def int8TopK(emb: DataFrame, k: Int, nQueries: Int): DataFrame = {
    val t = int8ServingTable(emb)
    val q = t.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("codes").as("qc"),
        col("code_norm").as("qn"))
    val c = t.select(col("vec_id").as("neighbor_id"), col("codes").as("cc"),
      col("code_norm").as("cn"), col("label").as("neighbor_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        graft.plans.Int8Vec.dot(col("qc"), col("cc")).cast("double") /
          (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        col("cosine"), col("rank"))
  }

  def qInt8TopK(spark: SparkSession, dir: String): DataFrame =
    int8TopK(Tables.embeddings(spark, dir), k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank"))

  /** Full DuckDB twin of [[qInt8TopK]]: identical max-based scale and
    * round-half-away codes (DuckDB `round` rounds half away from zero,
    * matching [[graft.plans.Int8Vec.Int8Codes]]'s rint-plus-tie-patch),
    * integer dots (exact — order-independent), and the same
    * `dot / (sqrt(qq) * sqrt(cc))` rounding sequence. */
  def oInt8TopK: String =
    s"""WITH x AS (
       |  SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
       |  FROM embeddings),
       |s AS (
       |  SELECT vec_id, label, xd,
       |         list_max(list_transform(xd, v -> abs(v))) / $Levels.0 AS scale
       |  FROM x),
       |c AS (
       |  SELECT vec_id, label,
       |         list_transform(xd, v -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
       |           ELSE CAST(round(v/scale) AS BIGINT) END) AS q
       |  FROM s),
       |n AS (
       |  SELECT vec_id, label, q,
       |    sqrt(CAST(list_sum(list_transform(q, v -> v * v)) AS DOUBLE)) AS nrm
       |  FROM c),
       |p AS (
       |  SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
       |    cv.label AS neighbor_label,
       |    CAST(list_sum(list_transform(list_zip(qv.q, cv.q),
       |      x -> x[1] * x[2])) AS DOUBLE) / (qv.nrm * cv.nrm) AS cosine
       |  FROM n qv JOIN n cv ON qv.vec_id < 50 AND cv.vec_id != qv.vec_id)
       |SELECT query_id, neighbor_id, neighbor_label, cosine,
       |       CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM p)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Full DuckDB twin of [[qQuantizedTopK]]: identical scale (max-based),
    * identical round-half-away reconstruction, and the sequential-fold
    * dot/norm idiom that is bit-exact vs the native kernel (see
    * [[Similarity.oCosineTopK]]). */
  def oQuantizedTopK: String =
    s"""WITH x AS (
       |  SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
       |  FROM embeddings),
       |s AS (
       |  SELECT vec_id, label, xd,
       |         list_max(list_transform(xd, v -> abs(v))) / $Levels.0 AS scale
       |  FROM x),
       |d AS (
       |  SELECT vec_id, label,
       |         list_transform(xd, v -> CASE WHEN scale = 0 THEN 0
       |           ELSE round(v/scale)*scale END) AS de
       |  FROM s),
       |n AS (
       |  SELECT vec_id, label, de,
       |    sqrt(list_sum(list_transform(de, v -> v * v))) AS nrm
       |  FROM d),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    c.label AS neighbor_label,
       |    list_sum(list_transform(list_zip(q.de, c.de),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.vec_id < 50 AND c.vec_id != q.vec_id)
       |SELECT query_id, neighbor_id, neighbor_label, cosine,
       |       CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM p)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Dimensions covered by the covariance statistics query (pairs grow
    * quadratically in this; 16 dims = 136 upper-triangle entries). */
  val CovDims = 16

  /** Exact integer covariance statistics over the int8 CODE domain —
    * the embedding-drift / PCA-preprocessing statistic, computable at
    * any corpus size in ONE partial+final aggregate pass: for each dim
    * pair i ≤ j the moments (n, Σcᵢ, Σcⱼ, Σcᵢcⱼ) and the covariance
    * numerator n·Σcᵢcⱼ − Σcᵢ·Σcⱼ. All BIGINT (|c| ≤ 127, so even
    * exabyte-scale counts stay far from overflow) — integer sums are
    * order-independent, hence the full cross-engine hash gate that
    * float covariance could never carry. The moment vector is also
    * MERGEABLE (add counterpart sums), the same incremental contract as
    * [[graft.operators.Rollup]]. No shuffle: the aggregate reduces to
    * one row; the pair melt is driver-composed projection. */
  def codeCovariance(emb: DataFrame, dims: Int = CovDims): DataFrame = {
    val pairs = for (i <- 0 until dims; j <- i until dims) yield (i, j)
    val base = withScale(emb).select(
      transform(col("xd"), v =>
        when(col("scale") === 0d, 0d).otherwise(round(v / col("scale"))))
        .cast("array<long>").as("c"))
    def c(i: Int) = element_at(col("c"), i + 1)
    val moments =
      (0 until dims).map(i => sum(c(i)).as(s"m_$i")) ++
        pairs.map { case (i, j) => sum(c(i) * c(j)).as(s"p_${i}_${j}") }
    val agged = base.agg(count(lit(1)).as("n"), moments: _*)
    agged
      .select(explode(array(pairs.map { case (i, j) =>
        struct(lit(i).as("i"), lit(j).as("j"), col("n"),
          col(s"m_$i").as("sum_i"), col(s"m_$j").as("sum_j"),
          col(s"p_${i}_${j}").as("sum_ij"))
      }: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("cov_num",
        col("n") * col("sum_ij") - col("sum_i") * col("sum_j"))
      .orderBy(col("i"), col("j"))
  }

  def qCodeCovariance(spark: SparkSession, dir: String): DataFrame =
    codeCovariance(Tables.embeddings(spark, dir))

  /** Twin: same codes, one MATERIALIZED aggregate row, the pair melt as
    * a generated union over the 1-row CTE. */
  def oCodeCovariance: String = {
    val dims = CovDims
    val pairs = for (i <- 0 until dims; j <- i until dims) yield (i, j)
    val momentCols =
      (0 until dims).map(i =>
        s"CAST(sum(c[${i + 1}]) AS BIGINT) AS m_$i") ++
        pairs.map { case (i, j) =>
          s"CAST(sum(c[${i + 1}] * c[${j + 1}]) AS BIGINT) AS p_${i}_$j" }
    val branches = pairs.map { case (i, j) =>
      s"SELECT $i AS i, $j AS j, n, m_$i AS sum_i, m_$j AS sum_j, p_${i}_$j AS sum_ij FROM a"
    }
    s"""WITH x AS (
       |  SELECT list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
       |  FROM embeddings),
       |s AS (
       |  SELECT xd, list_max(list_transform(xd, v -> abs(v))) / $Levels.0 AS scale
       |  FROM x),
       |codes AS (
       |  SELECT list_transform(xd, v -> CASE WHEN scale = 0 THEN 0
       |    ELSE CAST(round(v/scale) AS BIGINT) END) AS c
       |  FROM s),
       |a AS MATERIALIZED (
       |  SELECT count(*) AS n, ${momentCols.mkString(", ")}
       |  FROM codes)
       |SELECT i, j, n, sum_i, sum_j, sum_ij,
       |       n * sum_ij - sum_i * sum_j AS cov_num
       |FROM (${branches.mkString(" UNION ALL ")})
       |ORDER BY i, j""".stripMargin
  }
}
