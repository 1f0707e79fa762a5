package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** HITS: the Spark plan must reproduce an independent plain-Scala
  * run of the integer recurrence exactly, mass must survive the L1
  * normalizations, and planted structure must rank where mutual
  * reinforcement says it should. */
class HitsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala twin of the integer recurrence — independent of every
    * Spark construct the operator uses. */
  private def referenceHits(edges: Seq[(Long, Long)], iterations: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val S = Graph.HitsScale
    def normalize(raw: Map[Long, Long]): Map[Long, Long] = {
      val unit = math.max(raw.values.sum / S, 1L)
      raw.map { case (k, v) => k -> v / unit }
    }
    var h = edges.map(_._1).distinct.map(_ -> S).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iterations) {
      a = normalize(edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map(e => h(e._1)).sum })
      h = normalize(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum })
    }
    (h, a)
  }

  test("fixture scores are bit-equal to the plain-Scala recurrence") {
    val edges = Graph.purchaseEdgesDirected(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (h, a) = referenceHits(edges, Graph.HitsIterations)
    val got = Graph.hits(Graph.purchaseEdgesDirected(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == h.size + a.size)
    h.foreach { case (k, v) => assert(got(("hub", k)) == v, s"hub $k") }
    a.foreach { case (k, v) => assert(got(("authority", k)) == v, s"auth $k") }
  }

  test("mass survives normalization within the floor-loss bound") {
    val edges = Graph.purchaseEdgesDirected(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val scored = Graph.hits(Graph.purchaseEdgesDirected(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf)))
    val sums = scored.groupBy(col("role"))
      .agg(sum(col("score_fp")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the exact bound per normalization: undershoot ≤ one floor per node
    // (Σ ≥ Scale − n), overshoot ≤ the floored UNIT's slack,
    // Σ ≤ tot/(tot div Scale) ≤ Scale·(1 + 1/q) with q = tot div Scale —
    // q is data-dependent (sf0.001 has ~10 suppliers → q ≈ 12), so
    // derive it from the final half-steps' raw totals
    val S = Graph.HitsScale
    var h = edges.map(_._1).distinct.map(_ -> S).toMap
    var qa = 0L; var qh = 0L
    for (_ <- 1 to Graph.HitsIterations) {
      val aRaw = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map(e => h(e._1)).sum }
      qa = math.max(aRaw.values.sum / S, 1L)
      val a = aRaw.map { case (k, v) => k -> v / qa }
      val hRaw = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum }
      qh = math.max(hRaw.values.sum / S, 1L)
      h = hRaw.map { case (k, v) => k -> v / qh }
    }
    def check(role: String, q: Long): Unit = {
      val (s, n) = sums(role)
      assert(s >= S - n - 1, s"$role mass $s lost more than the floors ($n)")
      assert(s <= S + S / q + 1, s"$role mass $s overshot the 1/q=$q bound")
    }
    check("authority", qa)
    check("hub", qh)
  }

  test("perfect matching: floor loss below Scale must not null the scores") {
    // 3 hubs, 3 auths, one edge each: hub raw total = 999999 < Scale
    // after the first auth step — the unit floors at 1 instead of 0
    val edges = Seq((1L, 11L), (2L, 12L), (3L, 13L)).toDF("src", "dst")
    val rows = Graph.hits(edges).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(!r.isNullAt(2) && r.getLong(2) > 0, s"$r"))
    // and it still matches the plain-Scala recurrence exactly
    val (h, a) = referenceHits(Seq((1L, 11L), (2L, 12L), (3L, 13L)),
      Graph.HitsIterations)
    rows.foreach { r =>
      val want = if (r.getString(0) == "hub") h(r.getLong(1)) else a(r.getLong(1))
      assert(r.getLong(2) == want, s"$r != $want")
    }
  }

  test("planted star: the universally-bought supplier is the top authority") {
    // customers 1..5 each buy from their own supplier; all buy from 100
    val edges = ((1L to 5L).map(c => (c, 100L)) ++
      (1L to 5L).map(c => (c, c + 10L))).toDF("src", "dst")
    val top = Graph.hits(edges)
      .filter(col("role") === "authority")
      .orderBy(col("score_fp").desc, col("entity_key"))
      .collect()
    assert(top.head.getLong(1) == 100L)
    // and it strictly out-scores every single-buyer supplier
    assert(top.head.getLong(2) > top(1).getLong(2))
  }

  test("serving path (settled layout + broadcast scores) is bit-equal") {
    // the gated inline query runs a bounded order slice; the serving
    // path proves the FULL graph, so compare against the unbounded form
    val inline = Graph.qHits(spark, sf, bounded = false)
      .collect().map(_.toSeq).toSeq
    val serving = Graph.qHitsServing(spark, sf).collect().map(_.toSeq).toSeq
    assert(inline == serving)
  }

  test("gated query shape: 10 per role, rank dense from 1") {
    val rows = Graph.qHits(spark, sf).collect()
    val byRole = rows.groupBy(_.getString(0))
    assert(byRole.keySet == Set("hub", "authority"))
    byRole.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 10))
      // scores are non-increasing in rank
      val sorted = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(sorted.zip(sorted.tail).forall { case (x, y) => x >= y })
    }
  }
}
