package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Maximal Marginal Relevance re-ranking — the diversity stage a
  * retrieval-serving stack runs AFTER top-k: from a relevance-ordered
  * candidate pool, greedily pick results maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` so near-duplicate
  * neighbors don't crowd the result page (Carbonell & Goldstein 1998).
  *
  * Determinism across engines: relevance and candidate-pair cosines are
  * the SAME kernel expressions as [[Similarity.bruteForceTopK]] (ordered
  * folds — bit-identical to the twin's list arithmetic), the greedy
  * scores are fixed-order double ops (λ = 0.5 is an exact halving), and
  * the selection comparator uses raw IEEE `>`/`==` with an id tiebreak —
  * exactly the ORDER BY the twin's recursive CTE runs, down to
  * −0.0 == 0.0. The greedy recurrence itself is inherently sequential
  * PER QUERY (each pick conditions the next), so the only parallelism —
  * across queries — is what the implementation uses.
  *
  * Scale shape (100 TB): the expensive parts (top-`Pool` retrieval, the
  * Pool²/2 pair cosines per query) stay declarative joins; the greedy
  * runs in mapGroups over ≤ Pool candidates per query — bounded state,
  * #queries-way parallel, zero driver involvement. */
object Mmr {

  val Pool = 10
  val K = 5
  val NQueries = 50

  /** Greedy MMR over per-query pools. `cands` are (nid, rel); `sims`
    * hold each unordered candidate pair once (x < y). */
  private[graft] def greedy(cands: Seq[(Long, Double)],
      sims: Map[(Long, Long), Double], k: Int)
      : Seq[(Long, Int, Double, Double)] = {
    def simOf(x: Long, y: Long): Double =
      sims(if (x < y) (x, y) else (y, x))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Double)]
    var selected = List.empty[Long]
    for (step <- 1 to math.min(k, cands.size)) {
      var bestNid = -1L; var bestRel = 0.0; var bestSc = 0.0; var init = false
      cands.foreach { case (nid, rel) =>
        if (!selected.contains(nid)) {
          val sc =
            if (selected.isEmpty) 0.5 * rel
            else {
              var ms = Double.NegativeInfinity
              selected.foreach { s =>
                val v = simOf(nid, s); if (v > ms) ms = v
              }
              0.5 * rel - 0.5 * ms
            }
          // raw IEEE compare + id tiebreak — the twin's ORDER BY
          if (!init || sc > bestSc || (sc == bestSc && nid < bestNid)) {
            init = true; bestNid = nid; bestRel = rel; bestSc = sc
          }
        }
      }
      selected ::= bestNid
      picks += ((bestNid, step, bestRel, bestSc))
    }
    picks.toSeq
  }

  def mmrRerank(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cand = Similarity.bruteForceTopK(emb, Pool, NQueries)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    val n = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val withVec = cand
      .join(n.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("e"), col("nrm").as("nr")), Seq("neighbor_id"))
    val pairs = withVec.as("a")
      .join(withVec.as("b"),
        col("a.query_id") === col("b.query_id")
          && col("a.neighbor_id") < col("b.neighbor_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.neighbor_id").as("x"), col("b.neighbor_id").as("y"),
        (Similarity.dot(col("a.e"), col("b.e")) /
          (col("a.nr") * col("b.nr"))).as("sim"))
    val g = cand.groupBy(col("query_id"))
      .agg(collect_list(struct(col("neighbor_id"), col("cosine"))).as("cands"))
    val pg = pairs.groupBy(col("query_id"))
      .agg(collect_list(struct(col("x"), col("y"), col("sim"))).as("sims"))
    g.join(pg, Seq("query_id"))
      .as[(Long, Seq[(Long, Double)], Seq[(Long, Long, Double)])]
      .flatMap { case (qid, cands, simsL) =>
        val simMap = simsL.map { case (x, y, s) => ((x, y), s) }.toMap
        greedy(cands.sortBy(_._1), simMap, K)
          .map { case (nid, step, rel, sc) => (qid, nid, step, rel, sc) }
      }
      .toDF("query_id", "neighbor_id", "mmr_rank", "cosine", "mmr_score")
  }

  def qMmrRerank(spark: SparkSession, dir: String): DataFrame =
    mmrRerank(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("mmr_rank"))

  /** Twin: same candidate pool and pair cosines as [[Similarity.oCosineTopK]],
    * greedy replayed as a recursive CTE carrying the selected set, each
    * step's argmax via LATERAL ORDER BY score DESC, id LIMIT 1. */
  def oMmrRerank: String =
    s"""WITH RECURSIVE n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(list_zip(q.embedding, c.embedding),
      |      t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / (q.nrm * c.nrm) AS cosine
      |  FROM n q JOIN n c ON q.vec_id < $NQueries AND c.vec_id != q.vec_id),
      |cand AS (
      |  SELECT query_id, neighbor_id, cosine
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |        FROM p)
      |  WHERE rnk <= $Pool),
      |sims AS (
      |  SELECT a.query_id, a.neighbor_id AS x, b.neighbor_id AS y,
      |    list_sum(list_transform(list_zip(na.embedding, nb.embedding),
      |      t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / (na.nrm * nb.nrm) AS sim
      |  FROM cand a
      |  JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
      |  JOIN n na ON na.vec_id = a.neighbor_id
      |  JOIN n nb ON nb.vec_id = b.neighbor_id),
      |r AS (
      |  SELECT query_id, 1 AS mmr_rank, [neighbor_id] AS sel,
      |         neighbor_id, cosine, 0.5 * cosine AS mmr_score
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY query_id ORDER BY 0.5 * cosine DESC, neighbor_id) AS rn
      |        FROM cand)
      |  WHERE rn = 1
      |  UNION ALL
      |  SELECT r.query_id, r.mmr_rank + 1, list_append(r.sel, w.neighbor_id),
      |         w.neighbor_id, w.cosine, w.score
      |  FROM r, LATERAL (
      |    SELECT c.neighbor_id, c.cosine,
      |      0.5 * c.cosine - 0.5 * (
      |        SELECT max(s.sim) FROM sims s
      |        WHERE s.query_id = c.query_id
      |          AND ((s.x = c.neighbor_id AND list_contains(r.sel, s.y))
      |            OR (s.y = c.neighbor_id AND list_contains(r.sel, s.x)))) AS score
      |    FROM cand c
      |    WHERE c.query_id = r.query_id AND NOT list_contains(r.sel, c.neighbor_id)
      |    ORDER BY score DESC, c.neighbor_id LIMIT 1) w
      |  WHERE r.mmr_rank < $K)
      |SELECT query_id, neighbor_id, CAST(mmr_rank AS INTEGER) AS mmr_rank,
      |       cosine, mmr_score
      |FROM r ORDER BY query_id, mmr_rank""".stripMargin
}
