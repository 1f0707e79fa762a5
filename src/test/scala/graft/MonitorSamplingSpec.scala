package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Monitor, Sampling}

/** Weighted sampling (inclusion ∝ size, HT-unbiasedness) and drift
  * monitoring (planted shift detection, zero-bucket reporting). */
class MonitorSamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("weighted sample keeps long docs at ~cap rate and is deterministic") {
    val docs = (1L to 4000L).map { i =>
      val n = if (i % 2 == 0) 400 else 10 // long docs at the 200-word cap
      (i, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val s1 = Sampling.weightedSample(docs).collect()
    val s2 = Sampling.weightedSample(docs).collect()
    assert(s1.toSeq == s2.toSeq)
    val longRate = s1.count(_.getLong(1) == 200L) / 2000.0
    val shortRate = s1.count(_.getLong(1) == 10L) / 2000.0
    // long docs: p = 0.30 exactly (capped); short docs: p = 10*30/20000 = 0.015
    assert(math.abs(longRate - 0.30) < 0.04, s"long-doc rate $longRate")
    assert(math.abs(shortRate - 0.015) < 0.01, s"short-doc rate $shortRate")
  }

  test("Horvitz-Thompson: ipw is exactly 1/p and the estimator is sane") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val rows = Sampling.weightedSample(docs).collect()
    // the exact invariant: p(d)·ipw(d) = 1 for every sampled row
    rows.foreach { r =>
      val p = r.getLong(1) * Sampling.RatePct / (Sampling.Cap * 100.0)
      assert(math.abs(p * r.getDouble(2) - 1.0) < 1e-12,
        s"doc ${r.getLong(0)}: ipw not 1/p")
    }
    // one fixed hash draw on a small corpus → only an order-of-magnitude
    // band is meaningful (the short-doc ipw terms carry high variance)
    val n = docs.count().toDouble
    val est = rows.map(_.getDouble(2)).sum
    assert(est > 0.4 * n && est < 2.0 * n, s"HT estimate $est vs corpus $n")
  }

  test("drift monitor flags a planted shift and keeps zero buckets") {
    def ev(id: Long, ts: String, v: Double) =
      (id, Timestamp.valueOf(ts), v)
    // baseline mass in bucket 0; current mass moved to bucket 4
    val events = ((1L to 100L).map(i => ev(i, "2024-01-02 00:00:00", 10.0)) ++
      (101L to 200L).map(i => ev(i, "2024-01-25 00:00:00", 210.0)))
      .toDF("event_id", "ts", "value")
    val out = Monitor.valueDrift(events).collect()
    assert(out.length == Monitor.NBuckets, "dense bucket spine expected")
    val byBucket = out.map(r => r.getLong(0) -> r).toMap
    assert(byBucket(0L).getLong(1) == 100L && byBucket(0L).getLong(2) == 0L)
    assert(byBucket(4L).getLong(1) == 0L && byBucket(4L).getLong(2) == 100L)
    assert(byBucket(9L).getLong(1) == 0L && byBucket(9L).getLong(2) == 0L)
    // full-mass swap: both shifted buckets contribute (1-0)^2/(1+0) = 1
    val chi2 = out.sortBy(_.getLong(0)).map(_.getDouble(5)).foldLeft(0.0)(_ + _)
    assert(math.abs(chi2 - 2.0) < 1e-12)
    // identical windows → zero divergence
    val same = ((1L to 50L).map(i => ev(i, "2024-01-02 00:00:00", (i % 5) * 60.0)) ++
      (51L to 100L).map(i => ev(i, "2024-01-25 00:00:00", (i % 5) * 60.0)))
      .toDF("event_id", "ts", "value")
    val flat = Monitor.valueDrift(same).collect()
    assert(flat.forall(_.getDouble(5) == 0.0))
  }

  test("mid-window events are excluded from both sides") {
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), 10.0),
      (2L, Timestamp.valueOf("2024-01-15 00:00:00"), 10.0), // between windows
      (3L, Timestamp.valueOf("2024-01-25 00:00:00"), 10.0)
    ).toDF("event_id", "ts", "value")
    val b0 = Monitor.valueDrift(events).filter($"bucket" === 0).collect()(0)
    assert(b0.getLong(1) == 1L && b0.getLong(2) == 1L)
  }

  test("fixture queries run: drift report dense, sample non-trivial") {
    val drift = Monitor.qValueDrift(spark, "/root/testdata/sf0.001").collect()
    assert(drift.length == Monitor.NBuckets)
    assert(math.abs(drift.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    val samp = Sampling.qWeightedSample(spark, "/root/testdata/sf0.001").collect()
    assert(samp.nonEmpty && samp.forall(_.getDouble(2) >= 1.0 / 0.30 - 1e-9))
  }
}
