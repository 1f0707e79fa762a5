package graft

import org.apache.spark.sql.functions._

import graft.operators.Fusion

class FusionSpec extends SparkSpecBase {

  test("rrf arithmetic reconciles with the leg ranks, top list well-formed") {
    val out = Fusion.qHybridRrf(spark, sf).cache()
    assert(out.count() == 10)
    val rows = out.collect()
    assert(rows.map(_.getInt(4)).toSeq == (1 to 10))
    rows.foreach { r =>
      val c1 = Option(r.get(1)).map(x => 1000000L / (60 + x.asInstanceOf[Int])).getOrElse(0L)
      val c2 = Option(r.get(2)).map(x => 1000000L / (60 + x.asInstanceOf[Int])).getOrElse(0L)
      assert(r.getLong(3) == c1 + c2, s"rrf mismatch in $r")
    }
    // fused scores are non-increasing down the list
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("a doc ranked #1 by both legs is fused #1") {
    // both legs rank by query-term signal over the same corpus, so the
    // doc at bm25 #1 AND tf #1 (when it exists) must top the fusion
    val out = Fusion.qHybridRrf(spark, sf).collect()
    val both1 = out.find(r => !r.isNullAt(1) && !r.isNullAt(2)
      && r.getInt(1) == 1 && r.getInt(2) == 1)
    both1.foreach(r => assert(r.getInt(4) == 1, s"double-#1 not fused first: $r"))
    // docs seen by both legs outrank equal-rank single-leg docs:
    // max single-leg contribution is 1e6/61 < any two-leg sum
    val single = out.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
      .map(_.getLong(3))
    val double2 = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(_.getLong(3))
    if (single.nonEmpty && double2.nonEmpty)
      assert(double2.min >= single.max || double2.min >= 2 * 1000000L / (60 + 20),
        "two-leg consensus unexpectedly below a single leg")
  }
}
