package graft

import org.apache.spark.sql.functions._

import graft.operators.Mmr

class MmrSpec extends SparkSpecBase {

  test("greedy hand-check: near-duplicate of the top pick is deferred") {
    // rels: a=0.9, b=0.88, c=0.5; sim(a,b)=0.99 (near-dups), others 0.1
    val cands = Seq((1L, 0.9), (2L, 0.88), (3L, 0.5))
    val sims = Map((1L, 2L) -> 0.99, (1L, 3L) -> 0.1, (2L, 3L) -> 0.1)
    val picks = Mmr.greedy(cands, sims, 3).map(_._1)
    // pure relevance order would be a, b, c; MMR defers the near-dup b:
    // step2 scores: b = .44 − .495 < 0; c = .25 − .05 = .2 → c wins
    assert(picks == Seq(1L, 3L, 2L), picks.toString)
  }

  test("ties break toward the smaller id, IEEE-equal scores") {
    val cands = Seq((7L, 0.6), (3L, 0.6), (9L, 0.2))
    val sims = Map((3L, 7L) -> 0.0, (3L, 9L) -> 0.0, (7L, 9L) -> 0.0)
    val picks = Mmr.greedy(cands, sims, 2).map(_._1)
    assert(picks == Seq(3L, 7L), picks.toString)
  }

  test("fixture re-rank: first pick is the relevance top-1, picks are distinct") {
    val out = Mmr.qMmrRerank(spark, sf).cache()
    val first = out.filter(col("mmr_rank") === 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top1 = graft.operators.Similarity.qCosineTopK(spark, sf)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == top1, "MMR step 1 must equal the relevance top-1")
    // 5 distinct picks per query
    val dup = out.groupBy(col("query_id"))
      .agg(countDistinct(col("neighbor_id")).as("d"), count(lit(1)).as("n"))
      .filter(col("d") =!= col("n")).count()
    assert(dup == 0)
    assert(out.count() == 250)
  }
}
