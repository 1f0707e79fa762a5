package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** IVF (inverted-file) approximate nearest neighbor — the data-adaptive
  * scale path next to Similarity's sign-LSH: a k-means coarse quantizer
  * partitions the corpus into cells, and each query scans only its
  * `nProbe` closest cells.
  *
  * Scale design: the trained centroids are tiny (cells × dims doubles)
  * and ride along inside the assignment kernel as a plan reference
  * object ([[graft.plans.MatVec]]) — no broadcast join, no state, and
  * generated code that stays O(1) in the cell count.
  * Candidate vectors shuffle once on their cell id; at 100 TB the corpus
  * is written clustered by cell (partitionBy(cell)), making a probe a
  * partition-pruned scan of nProbe/cells of the data. Training runs on a
  * sample; assignment is one codegen'd pass.
  */
object Ivf {

  val Cells = 16
  val NProbe = 6
  val Seed = 42L

  /** Rows to train the quantizer on — cell quality plateaus fast with
    * sample size, while training cost is linear in it. */
  val TrainSample = 4000L

  /** Spherical k-means: cluster L2-normalized vectors so Euclidean
    * argmin ≡ cosine argmax; centroids re-normalized on the driver so
    * ranking by plain dot product is ranking by cosine. Trains on a
    * bounded seeded sample — at corpus scale the quantizer never sees
    * more than TrainSample rows regardless of data size. */
  def trainCentroids(emb: DataFrame, k: Int = Cells): Seq[Array[Double]] = {
    val sampled = emb.select(col("embedding"))
      .orderBy(xxhash64(col("embedding"))).limit(TrainSample.toInt)
    val feat = sampled
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .select(array_to_vector(
        transform(col("embedding"), x => x.cast("double") / col("nrm"))).as("features"))
    val model = new KMeans().setK(k).setSeed(Seed).setMaxIter(10).fit(feat)
    model.clusterCenters.toIndexedSeq.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
  }

  /** Array of the nProbe highest-dot cells as (score, cell) structs,
    * best first. Coarse dots come from the [[graft.plans.MatVec.MatDots]]
    * reference-object kernel (the literal-per-element composition it
    * replaces blew Janino's 64 KB method limit at 16×64 and knocked
    * these stages out of whole-stage codegen); the (score, cell) struct
    * build and descending sort run on the resulting 16-element array —
    * query-side only, so the interpreted transform lambda touches
    * nQueries rows, not the corpus. */
  def probeCells(emb: Column, cents: Seq[Array[Double]], nProbe: Int): Column =
    slice(
      sort_array(
        transform(graft.plans.MatVec.dots(emb, cents),
          (d, i) => struct(d.as("score"), i.as("cell"))),
        asc = false),
      1, nProbe)

  /** The single best cell — the coarse-quantizer assignment. This runs
    * once per CORPUS row (the hot half of the quantizer), so it is a
    * single fused argmax kernel ([[graft.plans.MatVec.ArgMaxDot]]):
    * ties take the larger cell id, bit-replicating the `array_max` over
    * (score, cell) structs it replaces, and the stage stays codegen'd
    * regardless of cell count. */
  def cellOf(emb: Column, cents: Seq[Array[Double]]): Column =
    graft.plans.MatVec.argMaxDot(emb, cents)

  /** IVF cosine top-k: exact cosine within the probed cells. Approximate
    * by construction (a true neighbor can live outside every probed
    * cell) → rows-only gate; recall property-tested vs brute force. */
  def ivfTopK(emb: DataFrame, k: Int, nQueries: Int,
      cells: Int = Cells, nProbe: Int = NProbe): DataFrame =
    ivfTopKWith(emb, trainCentroids(emb, cells), k, nQueries, nProbe)

  /** Top-k with a pre-trained quantizer — the serving pattern: the index
    * is built once and queried many times. */
  def ivfTopKWith(emb: DataFrame, cents: Seq[Array[Double]], k: Int,
      nQueries: Int, nProbe: Int = NProbe): DataFrame = {
    val n = emb.withColumn("nrm", Similarity.norm(col("embedding")))
    val cands = n.withColumn("cell", cellOf(col("embedding"), cents))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("nrm").as("cn"), col("cell"))
    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"),
        explode(probeCells(col("embedding"), cents, nProbe).getField("cell"))
          .as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(cands, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Per-query adaptive probe breadth — the score-gap rule: probe every
    * cell whose coarse score clears `best − margin`, capped at
    * `maxProbe`. A query that lands squarely inside one cell (big gap to
    * the runner-up) scans 1–2 cells; a query near a cell boundary (the
    * case where static nProbe loses recall) automatically widens. The
    * cap keeps worst-case cost = static nProbe cost; the margin is in
    * coarse-dot units (normalized centroids, so ∈ [−1, 1] cosine scale).
    * The best cell always qualifies (best ≥ best − margin), so the scan
    * is never empty. */
  def adaptiveProbeCells(emb: Column, cents: Seq[Array[Double]],
      maxProbe: Int = NProbe, margin: Double = AdaptiveMargin): Column = {
    val probed = probeCells(emb, cents, maxProbe)
    val best = element_at(probed, 1).getField("score")
    filter(probed, s => s.getField("score") >= best - lit(margin))
  }

  /** Default score-gap margin: on normalized noise-like fixtures the
    * coarse dots of rank-1 vs rank-6 cells differ by ~0.1–0.2, so 0.05
    * prunes confident queries hard while keeping boundary queries wide. */
  val AdaptiveMargin = 0.05

  /** IVF top-k with per-query adaptive probe breadth. With
    * `margin ≥ 2` (the full cosine range) every one of the `maxProbe`
    * cells qualifies and this is EXACTLY [[ivfTopKWith]] — spec-pinned,
    * so the adaptive rule's approximation is isolated and measurable,
    * the same discipline as IVFPQ's nProbe = cells identity. */
  def ivfTopKAdaptive(emb: DataFrame, cents: Seq[Array[Double]], k: Int,
      nQueries: Int, maxProbe: Int = NProbe,
      margin: Double = AdaptiveMargin): DataFrame = {
    val n = emb.withColumn("nrm", Similarity.norm(col("embedding")))
    val cands = n.withColumn("cell", cellOf(col("embedding"), cents))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("nrm").as("cn"), col("cell"))
    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"),
        explode(adaptiveProbeCells(col("embedding"), cents, maxProbe, margin)
          .getField("cell")).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(cands, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Trained quantizers per dataset dir (training is deterministic, so
    * caching only skips recomputation — results are unchanged). */
  private val quantizers =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Array[Double]]]()

  /** Cached per-dir quantizer (training is deterministic; sharing it with
    * the IVFPQ query only skips recomputation). */
  def centroidsFor(dir: String, emb: => DataFrame): Seq[Array[Double]] =
    quantizers.computeIfAbsent(dir, _ => trainCentroids(emb))

  def qIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val cents = centroidsFor(dir, Tables.embeddings(spark, dir))
    ivfTopKWith(Tables.embeddings(spark, dir), cents, k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank"))
  }

  def qIvfTopKAdaptive(spark: SparkSession, dir: String): DataFrame = {
    val cents = centroidsFor(dir, Tables.embeddings(spark, dir))
    ivfTopKAdaptive(Tables.embeddings(spark, dir), cents, k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The single trained quantizer this JVM has seen, if unambiguous.
    * Verify runs every query BEFORE dumping oracleSql, so by dump time
    * the cache holds exactly the one dataset's centroids — which makes
    * the "random" k-means quantizer a fixed literal the DuckDB twin can
    * inline (the sign-LSH hyperplane precedent). With zero or multiple
    * dirs cached the twin would be wrong for at least one of them, so
    * the entry is omitted (→ rows-only gate) instead. */
  def cachedCentroids: Option[(String, Seq[Array[Double]])] =
    if (quantizers.size == 1) {
      val e = quantizers.entrySet.iterator.next
      Some(e.getKey -> e.getValue)
    } else None

  /** Oracle entries generated AFTER training (empty until then). */
  def oracleEntries: Map[String, String] = cachedCentroids match {
    case Some((_, cents)) => Map(
      "sim_ivf_topk" -> oIvfTopK(cents),
      "sim_ivf_adaptive_topk" -> oIvfTopKAdaptive(cents),
      // clustered serving layout: same quantizer ⇒ same results
      "sim_ivf_clustered_topk" -> oIvfTopK(cents),
      "cluster_kmeans" -> oKmeansClusters(cents))
    case None => Map.empty
  }

  /** K-means corpus clustering as a first-class operator (topic/domain
    * bucketing for curation dashboards and stratified sampling) — the
    * IVF coarse quantizer surfaced as an assignment table: every vector
    * with its cluster and the cluster's population. Assignment is the
    * one codegen'd [[cellOf]] pass; sizes are a ≤Cells-row control-plane
    * aggregate broadcast back — no per-cluster shuffle, no skewed
    * window (16 clusters over 100 TB would serialize a
    * Window.partitionBy(cluster) into 16 giant partitions). */
  def qKmeansClusters(spark: SparkSession, dir: String): DataFrame = {
    val cents = centroidsFor(dir, Tables.embeddings(spark, dir))
    val assigned = Tables.embeddings(spark, dir)
      .withColumn("cluster", cellOf(col("embedding"), cents))
      .select(col("vec_id"), col("cluster"))
    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(broadcast(sizes), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  /** Generated twin: the shared assignment CTEs + per-cell sizes. */
  def oKmeansClusters(cents: Seq[Array[Double]]): String =
    s"""${ivfBaseSql(cents)},
       |sizes AS (SELECT cell, count(*) AS cluster_size FROM assign GROUP BY cell)
       |SELECT neighbor_id AS vec_id, cell AS cluster, cluster_size
       |FROM assign JOIN sizes USING (cell)
       |ORDER BY vec_id""".stripMargin

  /** Build-once clustered layouts per dataset dir (the serving
    * deployment shape — see [[writeClustered]]); shares [[quantizers]],
    * so probes — and results — match the inline path (spec-pinned). */
  private def servingClusteredFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("ivf_clustered", dir) { path =>
      val cents = centroidsFor(dir, Tables.embeddings(spark, dir))
      Tables.embeddings(spark, dir)
        .withColumn("cell", cellOf(col("embedding"), cents))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    }

  /** The 100 TB read shape, benchable: top-k against the PERSISTED
    * cell-partitioned layout — the probe is a partition-pruned scan of
    * the queries' ≤ nProbe cells' files only (build amortized out, like
    * a production index). Same quantizer ⇒ same results as [[qIvfTopK]],
    * so it shares the generated [[oIvfTopK]] twin. */
  def qIvfTopKClustered(spark: SparkSession, dir: String): DataFrame = {
    val path = servingClusteredFor(spark, dir)
    // computeIfAbsent, NOT get: buildOnce skips the builder (and its
    // training) when the persisted layout is already fresh — any second
    // JVM on the same machine — and training is deterministic, so
    // recomputing yields the books the layout was built with (ADVICE r11)
    val cents = centroidsFor(dir, Tables.embeddings(spark, dir))
    ivfTopKClustered(spark.read.parquet(path),
      Tables.embeddings(spark, dir).filter(col("vec_id") < 50), cents, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** One double as a DuckDB literal that parses AS DOUBLE. A plain
    * decimal literal ("0.123…") parses as DECIMAL, and DECIMAL→DOUBLE
    * double-rounds (hugeint / 10^s in float arithmetic) — measured 1-ulp
    * off the Java double for 17-digit values. An exponent forces the
    * strtod path, which round-trips Double.toString exactly. */
  private[operators] def dLit(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  private[operators] def vecLit(v: Array[Double]): String =
    v.map(dLit).mkString("[", ", ", "]")

  /** Centroid literal table (cell, cv): Double.toString round-trips the
    * exact bits, so both engines score bit-identical coarse dots. */
  private[operators] def centValuesSql(cents: Seq[Array[Double]]): String =
    cents.zipWithIndex
      .map { case (c, i) => s"($i, ${vecLit(c)})" }.mkString(", ")

  /** Shared twin prefix: norms, centroid literals, all vec×cell coarse
    * scores (the sequential-fold dot idiom, bit-exact with [[graft.plans.MatVec]]
    * — each kernel dot is the same left-to-right `acc += x·c`), and the
    * cell assignment (ties take the LARGER cell, replicating ArgMaxDot's
    * `acc >= best` scan). */
  private[operators] def ivfBaseSql(cents: Seq[Array[Double]]): String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |cent AS (SELECT * FROM (VALUES ${centValuesSql(cents)}) t(cell, cv)),
       |scored AS (
       |  SELECT vec_id, embedding, nrm, cell,
       |    list_sum(list_transform(list_zip(embedding, cv),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS score
       |  FROM n CROSS JOIN cent),
       |assign AS (
       |  SELECT vec_id AS neighbor_id, embedding AS ce, nrm AS cn, cell
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY vec_id ORDER BY score DESC, cell DESC) AS rn
       |        FROM scored)
       |  WHERE rn = 1)""".stripMargin

  /** Shared twin suffix: probed-cell join, exact cosine, per-query rank. */
  private val ivfTailSql: String =
    s"""p AS (
       |  SELECT query_id, neighbor_id,
       |    list_sum(list_transform(list_zip(qe, ce),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (qn * cn) AS cosine
       |  FROM probe JOIN assign USING (cell)
       |  WHERE query_id != neighbor_id)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM p)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Full DuckDB twin of [[qIvfTopK]]: the trained centroids are inlined
    * as literals (training is deterministic — fixed seed, bounded
    * xxhash64-ordered sample — and cached per dataset), so the twin
    * reproduces cell assignment, the top-nProbe probe order (ties to the
    * larger cell, matching sort_array desc on (score, cell) structs),
    * and bit-identical cosines. */
  def oIvfTopK(cents: Seq[Array[Double]]): String =
    s"""${ivfBaseSql(cents)},
       |probe AS (
       |  SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cell
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY vec_id ORDER BY score DESC, cell DESC) AS rn
       |        FROM scored WHERE vec_id < 50)
       |  WHERE rn <= $NProbe),
       |$ivfTailSql""".stripMargin

  /** Full DuckDB twin of [[qIvfTopKAdaptive]]: same base; the probe set
    * keeps the top-maxProbe cells whose coarse score clears
    * best − margin (the score-gap rule over the same bit-identical
    * scores; the margin literal parses to the same double both sides). */
  def oIvfTopKAdaptive(cents: Seq[Array[Double]]): String =
    s"""${ivfBaseSql(cents)},
       |probe AS (
       |  SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cell
       |  FROM (SELECT *,
       |          row_number() OVER (
       |            PARTITION BY vec_id ORDER BY score DESC, cell DESC) AS rn,
       |          max(score) OVER (PARTITION BY vec_id) AS best
       |        FROM scored WHERE vec_id < 50)
       |  WHERE rn <= $NProbe
       |    AND score >= best - CAST('${java.lang.Double.toString(AdaptiveMargin)}' AS DOUBLE)),
       |$ivfTailSql""".stripMargin

  /** The 100 TB layout: corpus written partitionBy(cell), so a probe is
    * a partition-pruned scan of its cells' files only. Returns the
    * centroids the layout was built with (the probe side must use the
    * same quantizer). */
  def writeClustered(emb: DataFrame, path: String,
      cells: Int = Cells): Seq[Array[Double]] = {
    val cents = trainCentroids(emb, cells)
    emb.withColumn("cell", cellOf(col("embedding"), cents))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    cents
  }

  /** Incremental index maintenance: assign a NEW vector batch with the
    * EXISTING quantizer and append into the persisted cell layout —
    * daily embedding loads join their cells' directories as new files;
    * settled cells' files are never rewritten and the quantizer never
    * retrains (retraining would re-assign old vectors and force a full
    * rebuild — index rebuilds are a scheduled, not per-batch, event).
    * Append into an empty path IS the initial build, so build and
    * maintenance are one code path. Cost per batch: one map-only
    * assignment scan of the batch + a partitioned append ∝ batch size,
    * independent of index size (the [[graft.operators.Cdc]] /
    * [[graft.operators.Scd]] incremental discipline). Probe results
    * over (build + appends) ≡ a from-scratch build over the union with
    * the same quantizer — spec-pinned. */
  def appendClustered(newEmb: DataFrame, path: String,
      cents: Seq[Array[Double]]): Unit =
    newEmb.withColumn("cell", cellOf(col("embedding"), cents))
      .write.mode("append").partitionBy("cell").parquet(path)

  /** Top-k against a clustered corpus: the union of the queries' probe
    * cells (≤ `cells` values, collected driver-side) becomes a static IN
    * filter on the partition column — Catalyst prunes every other cell's
    * files before any row is read. Same quantizer ⇒ same results as
    * [[ivfTopK]]. */
  def ivfTopKClustered(corpus: DataFrame, queries: DataFrame,
      cents: Seq[Array[Double]], k: Int, nProbe: Int = NProbe): DataFrame = {
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("qn", Similarity.norm(col("qe")))
      .withColumn("cell",
        explode(probeCells(col("qe"), cents, nProbe).getField("cell")))
    val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val cands = corpus.filter(col("cell").isin(probed.toIndexedSeq.map(Integer.valueOf): _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("cell"))
      .withColumn("cn", Similarity.norm(col("ce")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(cands, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
