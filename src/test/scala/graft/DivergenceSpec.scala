package graft

import graft.operators.Divergence

/** Hand-computed total-variation checks for the source-divergence op. */
class DivergenceSpec extends SparkSpecBase {
  import spark.implicits._

  test("vocab overlap: hand-computed Jaccard, symmetric pairs emitted once") {
    // s1 = {a,b,c}, s2 = {b,c,d}, s3 = {x}:
    // (s1,s2): 2 shared / 4 union → 500‰; pairs sharing NOTHING emit no
    // row (the pair table is sparse by construction — at scale that IS
    // the design: only colliding vocabularies ever join)
    val docs = Seq(
      ("s1", "a b c a"), ("s2", "b c d"), ("s3", "x x")).toDF("source", "text")
    val out = Divergence.vocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("shared_words"), r.getAs[Long]("va"),
          r.getAs[Long]("vb"), r.getAs[Long]("jaccard_milli"))).toMap
    assert(out.keySet == Set(("s1", "s2")))
    assert(out(("s1", "s2")) == (2L, 3L, 3L, 500L))
  }

  test("TV against the corpus matches hand arithmetic; bounds hold") {
    // corpus words: a,b (s1) + a,b (s2) + c,c (s3) → p = (1/3, 1/3, 1/3)
    // s1 = s2 = (1/2, 1/2, 0): TV = ½(1/6 + 1/6 + 1/3) = 1/3 → 333‰
    // s3 = (0, 0, 1):          TV = ½(1/3 + 1/3 + 2/3) = 2/3 → 666‰
    val docs = Seq(
      ("s1", "a b"), ("s2", "a b"), ("s3", "c c")).toDF("source", "text")
    val out = Divergence.sourceDivergence(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("tv_milli"))).toMap
    assert(out("s1") == (2L, 333L))
    assert(out("s2") == (2L, 333L))
    assert(out("s3") == (2L, 666L))
    // fixture corpus: every source lands strictly inside [0, 1000)
    val fx = Divergence.qSourceDivergence(spark, sf).collect()
    assert(fx.length >= 2)
    fx.foreach { r =>
      val tv = r.getAs[Long]("tv_milli")
      assert(tv >= 0L && tv < 1000L, r.toString)
    }
  }
}
