package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance-weighted selection: integer bucket-weight arithmetic,
  * exact floor scoring, and top-quarter selection semantics. */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucket weights are the log2-bucket difference, zero-count safe") {
    // bucket 1: ct=3, cr=7 → len(bin 4) − len(bin 8) = 3 − 4 = −1
    // bucket 2: no target hits, cr=3 → len(bin 1) − len(bin 4) = 1 − 3 = −2
    // bucket 3: all target, ct=cr=1 → len(bin 2) − len(bin 2) = 0
    val tokens = (Seq.fill(3)((1L, true)) ++ Seq.fill(4)((1L, false)) ++
      Seq.fill(3)((2L, false)) ++ Seq((3L, true)))
      .toDF("b", "is_target")
    val w = Dsir.bucketWeights(tokens).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == Map(1L -> -1L, 2L -> -2L, 3L -> 0L))
  }

  test("selection takes exactly the top quarter, ranked by per-token score") {
    val out = Dsir.qDsirSelect(spark, sf).cache()
    val n = out.count()
    val sel = out.filter(col("selected")).count()
    assert(sel == (n + 3) / 4, s"selected $sel of $n")
    // rank discipline: no unselected doc strictly outscores a selected one
    val minSel = out.filter(col("selected")).agg(min(col("dsir_mil")))
      .head().getLong(0)
    val maxUnsel = out.filter(!col("selected")).agg(max(col("dsir_mil")))
      .head().getLong(0)
    assert(minSel >= maxUnsel)
    // per-token score is the exact floor of 1000·sum/n_tokens
    val bad = out.filter(col("dsir_mil") =!=
      floor((lit(1000) * col("dsir_sum")).cast("double") / col("n_tokens"))
        .cast("long")).count()
    assert(bad == 0)
    // every doc with at least one token is scored
    val docs = Tables.documents(spark, sf)
      .filter(size(graft.functions.TextFns.words(col("text"))) > 0).count()
    assert(n == docs)
  }
}
