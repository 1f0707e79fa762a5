package graft

import org.apache.spark.sql.functions._

import graft.operators.Bitext

/** Bitext alignment: a planted translation (identical embedding across
  * languages) must align at cosine 1 with a healthy margin; the output
  * is cross-language only. */
class BitextSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(i: Int): Array[Float] =
    Array.tabulate(64)(j => (((i * 31 + j * 7) % 17) - 8) / 8.0f)

  test("planted translation aligns at cosine 1; output is cross-language only") {
    val emb = Seq(
      (1L, vec(1)), (2L, vec(2)), (3L, vec(3)), // en corpus
      (100L, vec(1)), // fr translation of doc 1 — identical embedding
      (101L, vec(5)), (102L, vec(2).map(x => x * 2.0f))) // de scaled copy of 2
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val docs = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"),
      (100L, "fr"), (101L, "zh"), (102L, "de"))
      .toDF("doc_id", "lang")
    val out = Bitext.crossLingualAlign(emb, docs, threshold = -1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // only non-pivot docs are queries; only pivot docs are targets
    assert(out.keySet.subsetOf(Set(100L, 101L, 102L)))
    out.values.foreach { case (_, pid, _, _) =>
      assert(Set(1L, 2L, 3L).contains(pid)) }
    // the translation pair: exact match, rank 1
    val (lang, pid, cos, margin) = out(100L)
    assert(lang == "fr" && pid == 1L)
    // dot/(‖a‖·‖b‖) of an identical pair rounds within one ulp of 1
    assert(math.abs(cos - 1.0) < 1e-12,
      s"identical embedding must score ~1.0, got $cos")
    // margin is NULL when the blocks yielded a single candidate
    // (ADVICE r13: single-candidate margins are not comparable);
    // with a second candidate present the translation must out-margin it
    margin.foreach(m =>
      assert(m > 0.0, "a unique translation must out-margin the field"))
    // the scaled copy (same direction): cosine 1 to its source
    out.get(102L).foreach { case (_, p, c, _) =>
      assert(p == 2L && math.abs(c - 1.0) < 1e-6) }
  }

  test("fixture invariants: bounded scores, pivot ids are english docs") {
    val rows = Bitext.qCrossLingualAlign(spark, sf).collect()
    assert(rows.nonEmpty)
    val enIds = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getString(1) != "en")
      assert(enIds.contains(r.getLong(2)))
      assert(r.getDouble(3) >= Bitext.AlignThreshold &&
        r.getDouble(3) <= 1.0 + 1e-9)
      // margin: NULL on single-candidate rows; otherwise cosine − cos2
      // with cos2 the rank-2 score, so margin ≥ 0 and cos2 ≤ 1
      if (!r.isNullAt(4)) {
        assert(r.getDouble(4) >= -1e-12)
        assert(r.getDouble(3) - r.getDouble(4) <= 1.0 + 1e-9)
      }
    }
  }
}
