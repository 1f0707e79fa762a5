package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupCurve}

/** Pins the threshold-sweep curve (ADVICE r9: the operator existed but
  * was unwired — now gated as `curation_dedup_curve`). */
class DedupCurveSpec extends SparkSpecBase {
  import spark.implicits._

  test("curve is one row per threshold and monotone non-increasing") {
    val rows = DedupCurve.qThresholdCurve(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == DedupCurve.Thresholds)
    // raising the threshold can only shrink every count
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1), "pairs_ge not monotone")
      assert(lo.getLong(2) >= hi.getLong(2), "docs_affected not monotone")
      assert(lo.getLong(3) >= hi.getLong(3), "docs_removed not monotone")
    }
    rows.foreach { r =>
      // removed docs are a subset of affected docs; bp is the long division
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000)
    }
  }

  test("curve at 0.8 agrees with the shingle-Jaccard dedup's own pair count") {
    val docs = Tables.documents(spark, sf)
    val curve80 = DedupCurve.thresholdCurve(docs)
      .filter(col("threshold_pct") === 80).head()
    // shingleJaccardPairs(0.8) fires on J >= 0.8, i.e. grade >= 80
    val direct = Dedup.shingleJaccardPairs(docs, 0.8).count()
    assert(curve80.getLong(1) == direct,
      s"curve pairs_ge(80) = ${curve80.getLong(1)} but dedup found $direct")
  }

  test("planted near-dups land at their exact jaccard grade") {
    // 9 shared shingles of 10 → J = 9/11? no: shingle sets here — craft
    // two docs sharing exactly half their shingles: J = 1/3 → grade 33
    val a = "w0 w1 w2 w3 w4 w5"   // shingles: 4 trigrams
    val b = "w0 w1 w2 x3 x4 x5"   // shares exactly 1 trigram (w0 w1 w2)
    val docs = Seq((1L, a, "s0"), (2L, b, "s0"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")))
    // inter = 1, union = 4 + 4 - 1 = 7 → grade = 100/7 = 14 → below 50:
    // the pair must not fire at any configured threshold
    val curve = DedupCurve.thresholdCurve(docs).collect()
    assert(curve.forall(_.getLong(1) == 0L))
    // identical docs fire at every threshold
    val dup = Seq((1L, a, "s0"), (2L, a, "s0"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")))
    val curve2 = DedupCurve.thresholdCurve(dup).collect()
    assert(curve2.forall(r => r.getLong(1) == 1L && r.getLong(3) == 1L))
    assert(curve2.forall(_.getLong(4) == 5000L)) // 1 of 2 docs = 5000 bp
  }
}
