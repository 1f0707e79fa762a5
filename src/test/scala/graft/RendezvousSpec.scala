package graft

import org.apache.spark.sql.functions._

import graft.operators.Rendezvous

class RendezvousSpec extends SparkSpecBase {

  test("resize moves ~1/(B+1) of keys under HRW vs almost all under mod") {
    val out = Rendezvous.qRendezvousResize(spark, sf).cache()
    val n = out.count()
    val moved = out.filter(col("moved")).count()
    val modMoved = out.filter(col("mod_moved")).count()
    // expectation 1/17 ≈ 5.9%; allow generous sampling noise on 500 keys
    assert(moved.toDouble / n < 0.15,
      s"HRW moved $moved of $n — should be ~1/17")
    assert(moved > 0, "a resize must move someone")
    assert(modMoved.toDouble / n > 0.8,
      s"mod moved only $modMoved of $n — fixture ids too regular?")
    // unmoved keys keep their bucket identity (stability property)
    assert(out.filter(!col("moved") &&
      col("bucket_before") =!= col("bucket_after")).count() == 0)
    // assignments stay in range under both widths
    assert(out.filter(col("bucket_before") < 0 || col("bucket_before") >= 16
      || col("bucket_after") < 0 || col("bucket_after") >= 17).count() == 0)
  }

  test("moved keys all land on the NEW bucket (HRW monotonicity)") {
    // rendezvous guarantee: growing the bucket set can only move a key
    // to the newly added bucket, never between old buckets
    val out = Rendezvous.qRendezvousResize(spark, sf)
    val bad = out.filter(col("moved") && col("bucket_after") =!= 16).count()
    assert(bad == 0, s"$bad keys moved between OLD buckets — not consistent hashing")
  }
}
