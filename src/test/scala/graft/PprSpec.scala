package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Personalized PageRank: the uniform-restart case must collapse to
  * classic PageRank bit-for-bit, restart mass must localize around the
  * seed, and the gated query must rank within the seed nation's
  * purchase neighborhood. */
class PprSpec extends SparkSpecBase {
  import spark.implicits._

  // symmetric path 1—2—3—4—5—6 (both directions per edge, the
  // purchaseEdges construction the broadcast-mode symmetry rewrite needs)
  private def pathEdges = {
    val fwd = (1L to 5L).map(i => (i, i + 1))
    (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
  }

  test("uniform seeds collapse to classic PageRank, bit-for-bit") {
    val edges = Graph.purchaseEdges(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val allNodes = edges.select(col("src").as("node")).distinct()
    val ppr = Graph.personalizedPageRankBucketed(edges, allNodes)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val pr = Graph.pageRank(edges)
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(ppr == pr)
  }

  test("restart mass localizes around the seed on a path graph") {
    val ranks = Graph.personalizedPageRankBucketed(
        pathEdges, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // monotone decay away from the seed end
    assert(ranks(1L) > ranks(3L) && ranks(3L) > ranks(5L),
      s"no seed locality: $ranks")
    assert(ranks(6L) < ranks(2L))
    // mass is conserved up to per-node floor loss
    val total = ranks.values.sum
    assert(total <= Graph.Scale && total >= Graph.Scale - 6 * Graph.Iterations)
  }

  test("seeds outside the graph contribute nothing; no live seed, no rank") {
    val ghost = Graph.personalizedPageRankBucketed(
        pathEdges, Seq(99L).toDF("node"))
      .collect()
    // a seed set with no graph presence leaves every node at rank 0
    assert(ghost.length == 6 && ghost.forall(_.getLong(2) == 0L))
    val mixed = Graph.personalizedPageRankBucketed(
        pathEdges, Seq(1L, 99L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the ghost seed is semi-joined away: identical to seeding {1} alone
    val solo = Graph.personalizedPageRankBucketed(
        pathEdges, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(mixed == solo)
  }

  test("gated query: 20 rows, ranks positive, seed nation's suppliers present") {
    val rows = Graph.qPprServing(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(4) >= 0))
    // descending by rank
    val scores = rows.map(_.getLong(4)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
