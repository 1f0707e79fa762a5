package graft

import graft.operators.{QualityCurve, TextAnalysis}

/** LM-score keep-curve: suffix-sum consistency against the per-doc
  * scores the curve summarizes. */
class QualityCurveSpec extends SparkSpecBase {

  test("keep-curve is a consistent suffix sum over the scored corpus") {
    val docs = Tables.documents(spark, sf)
    val rows = QualityCurve.qLmScoreCurve(spark, sf).collect()
    assert(rows.length >= 3, s"degenerate curve: ${rows.length} bands")
    // bands ascend; keep-counts are non-increasing suffix sums
    val bands = rows.map(_.getAs[Long]("band"))
    assert(bands.sameElements(bands.sorted))
    val kept = rows.map(_.getAs[Long]("docs_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
    // lowest threshold keeps every scored doc (= docs with >= 1 trigram)
    val scored = TextAnalysis.lmBucketScore(docs).count()
    assert(kept.head == scored)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scored)
    // per-band histogram and suffix columns agree
    val sufDocs = rows.scanRight(0L)((r, acc) =>
      acc + r.getAs[Long]("n_docs")).init
    assert(rows.map(_.getAs[Long]("docs_kept")).sameElements(sufDocs))
    val sufTok = rows.scanRight(0L)((r, acc) =>
      acc + r.getAs[Long]("n_tokens")).init
    assert(rows.map(_.getAs[Long]("tokens_kept")).sameElements(sufTok))
  }
}
