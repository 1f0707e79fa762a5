package graft

import org.apache.spark.sql.functions._

import graft.operators.Ks

/** Two-sample KS: exact rational distance, tie handling on shared
  * levels, the squared integer rejection rule, and partition-count
  * invariance of the distributed prefix. */
class KsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ks(rows: Seq[(Double, Boolean)], nPart: Int = 4) =
    Ks.ksDistance(rows.toDF("value", "is_a"), "value", col("is_a"),
        nPartitions = nPart)
      .collect().head

  test("identical samples: D = 0, no rejection") {
    val xs = (1 to 50).map(_.toDouble)
    val r = ks(xs.map((_, true)) ++ xs.map((_, false)))
    assert(r.getLong(0) == 50 && r.getLong(1) == 50)
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getInt(4) == 0)
  }

  test("disjoint supports: D = 1, rejected") {
    val r = ks((1 to 30).map(i => (i.toDouble, true)) ++
      (100 to 129).map(i => (i.toDouble, false)))
    assert(r.getLong(2) == 30L * 30L)
    assert(r.getLong(3) == 1000000L)
    assert(r.getInt(4) == 1)
  }

  test("hand-checked tied case: D computed at shared levels") {
    // A = {1,1,2}, B = {1,3,3}: levels 1,2,3
    // v=1: |2*3 - 1*3| = 3; v=2: |3*3 - 1*3| = 6; v=3: |9-9| = 0 → 6
    val r = ks(Seq((1.0, true), (1.0, true), (2.0, true),
      (1.0, false), (3.0, false), (3.0, false)))
    assert(r.getLong(2) == 6L, s"got $r")
    assert(r.getLong(3) == 666666L) // floor(6e6/9)
  }

  test("partition-count invariance on a generated mixture") {
    val rows = (1 to 400).map { i =>
      val v = ((i * 2654435761L) % 997L).toDouble / 10.0
      (if (i % 3 == 0) v + 5.0 else v, i % 2 == 0)
    }
    val ref = ks(rows, nPart = 1).toSeq
    for (n <- Seq(3, 16, 40)) assert(ks(rows, nPart = n).toSeq == ref,
      s"nPartitions=$n diverged")
  }

  test("empty input yields zero rows, matching the twin's grouped shape") {
    val out = Ks.ksDistance(
      Seq.empty[(Double, Boolean)].toDF("value", "is_a"), "value", col("is_a"))
    assert(out.count() == 0L)
    // all-null values are equally empty after the null filter
    val nulls = Ks.ksDistance(
      Seq((Option.empty[Double], true)).toDF("value", "is_a"),
      "value", col("is_a"))
    assert(nulls.count() == 0L)
  }

  test("gated query: same-generator types stay under the 0.05 rejection") {
    val r = Ks.qKsValueByType(spark, sf).collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getLong(2) >= 0)
    // fixture click/purchase values share a generator — the test must
    // NOT reject (if this trips, the generator changed shape)
    assert(r.getInt(4) == 0)
  }

  private def mwuRow(rows: Seq[(Double, Boolean)], nPart: Int = 4) =
    Ks.mwu(rows.toDF("value", "is_a"), "value", col("is_a"),
        nPartitions = nPart)
      .collect().head

  test("mwu: complete dominance gives U1 = n1*n2 (AUC = 1)") {
    // every A value above every B value
    val r = mwuRow((1 to 20).map(v => (v + 100.0, true)) ++
      (1 to 30).map(v => (v.toDouble, false)))
    assert(r.getLong(0) == 20 && r.getLong(1) == 30)
    assert(r.getLong(3) == 2L * 20 * 30, s"u1_x2 ${r.getLong(3)}")
    assert(r.getLong(4) == 1000000L)
  }

  test("mwu: identical samples give AUC exactly 1/2 via midranks") {
    val xs = (1 to 40).map(_.toDouble)
    val r = mwuRow(xs.map((_, true)) ++ xs.map((_, false)))
    // ties: each level holds one A and one B; symmetric → U1 = n²/2
    assert(r.getLong(3) == 2L * 40 * 40 / 2 * 2 / 2, s"u1_x2 ${r.getLong(3)}")
    assert(r.getLong(4) == 500000L, s"auc_micro ${r.getLong(4)}")
  }

  test("mwu: hand-computed tied case") {
    // A = {1, 2, 2}, B = {2, 3}: pooled midranks 1, 3, 3, 3, 5 (the
    // three 2s share rank (2+3+4)/3 = 3) → R1 = 1 + 3 + 3 = 7,
    // U1 = 7 − 3·4/2 = 1 → u1_x2 = 2, auc = 1/6
    val r = mwuRow(Seq((1.0, true), (2.0, true), (2.0, true),
      (2.0, false), (3.0, false)))
    assert(r.getLong(2) == 14L, s"r1_x2 ${r.getLong(2)}")
    assert(r.getLong(3) == 2L, s"u1_x2 ${r.getLong(3)}")
    assert(r.getLong(4) == 166666L)
  }

  test("mwu: an empty cohort yields NULL auc, not a division error") {
    // one-cohort input has no defined ranking AUC; the guard must emit
    // NULL symmetrically with the twin's CASE (ADVICE r15: DuckDB's
    // integer // would raise where non-ANSI Spark silently NULLs)
    val r = mwuRow((1 to 10).map(i => (i.toDouble, true)))
    assert(r.getLong(0) == 10 && r.getLong(1) == 0)
    assert(r.isNullAt(r.fieldIndex("auc_micro")),
      s"auc over an empty cohort must be NULL: $r")
  }

  test("mwu: invariant to partition count") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(_ =>
      (rng.nextInt(40).toDouble, rng.nextBoolean()))
    val ref = mwuRow(rows, 1).toSeq
    for (n <- Seq(3, 16, 40))
      assert(mwuRow(rows, n).toSeq == ref, s"nPartitions=$n diverged")
  }
}
