package graft

import org.apache.spark.sql.functions._

import graft.operators.{Moments, Rfm, Scd}

/** Mergeable-moments invariance, RFM segmentation rules, and SCD2
  * as-of snapshot semantics. */
class MomentsRfmSpec extends SparkSpecBase {

  test("moments merge is shard-invariant (16 hash shards ≡ 7 ≡ 1)") {
    val li = graft.Tables.lineitem(spark, sf)
    val a = Moments.finalize(Moments.merge(Moments.partials(li))).collect()
    val b = Moments.finalize(Moments.merge(
      Moments.partials(li, pmod(col("l_partkey"), lit(7L))))).collect()
    val c = Moments.finalize(Moments.merge(
      Moments.partials(li, lit(0L)))).collect()
    assert(a.toSet == b.toSet && b.toSet == c.toSet)
    assert(a.nonEmpty)
  }

  test("moments on known values: 1,2,3,4 per group") {
    import spark.implicits._
    val li = Seq.tabulate(4)(i =>
      (i.toLong, 0L, (i + 1).toDouble, "A", "F"))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_linestatus")
    val r = Moments.momentsMerged(li).collect().head
    assert(r.getAs[Long]("n_vals") == 4L)
    assert(r.getAs[Double]("mean_qty") == 2.5)
    assert(r.getAs[Double]("var_qty") == 1.25)
    assert(r.getAs[Double]("skew_qty") == 0.0)
    assert(math.abs(r.getAs[Double]("kurt_qty") - (2.5625 / 1.5625 - 3.0)) < 1e-12)
  }

  test("rfm scores are quintiles with balanced bucket sizes") {
    val r = Rfm.rfm(graft.Tables.orders(spark, sf)).cache()
    val n = r.count()
    for (cName <- Seq("r_score", "f_score", "m_score")) {
      val sizes = r.groupBy(col(cName)).count()
        .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      assert(sizes.keySet == Set(1, 2, 3, 4, 5))
      // ntile: bucket sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"$cName $sizes")
      assert(sizes.values.sum == n)
    }
    // rule consistency: every champion scores ≥4 on all three
    val badChampions = r.filter(col("segment") === "champion" &&
      (col("r_score") < 4 || col("f_score") < 4 || col("m_score") < 4)).count()
    assert(badChampions == 0L)
    // labels are exhaustive
    assert(r.filter(col("segment").isNull).count() == 0L)
    r.unpersist()
  }

  test("scalable rfm (distributed rank + closed-form ntile) equals the window form") {
    val orders = graft.Tables.orders(spark, sf)
    val a = Rfm.rfm(orders)
    val b = Rfm.rfmScalable(orders, nPartitions = 5)
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
    assert(a.count() == b.count() && a.count() > 0)
    // partition-count invariance (offsets derive from actual counts)
    val c = Rfm.rfmScalable(orders, nPartitions = 2)
    assert(a.exceptAll(c).count() == 0L && c.exceptAll(a).count() == 0L)
  }

  test("rfm on a tiny fact: higher spend/recent/frequent ranks higher") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // cust 1: 1 old small order; cust 5: many recent large orders
    val orders = Seq(
      (1L, 1L, "O", 10.0, ts("1995-01-01 00:00:00"), "1-URGENT"),
      (2L, 2L, "O", 20.0, ts("1996-01-01 00:00:00"), "1-URGENT"),
      (3L, 3L, "O", 30.0, ts("1997-01-01 00:00:00"), "1-URGENT"),
      (4L, 4L, "O", 40.0, ts("1998-01-01 00:00:00"), "1-URGENT"),
      (5L, 5L, "O", 50.0, ts("1998-06-01 00:00:00"), "1-URGENT"),
      (6L, 5L, "O", 60.0, ts("1998-07-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Rfm.rfm(orders).collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    assert(out(1L) == ((1, 1, 1)))
    assert(out(5L) == ((5, 5, 5)))
  }

  test("scd2 as-of snapshot equals latest-version-per-key at the instant") {
    val orders = graft.Tables.orders(spark, sf)
    val history = Scd.scd2Build(orders).cache()
    val at = lit(Scd.SnapshotAt).cast("timestamp")
    val snap = Scd.asOfSnapshot(history, at)
    // independent derivation: max version among versions started ≤ at
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("version").desc)
    val expected = history.filter(col("valid_from") <= at)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("version"), col("priority"), col("valid_from"))
    assert(snap.exceptAll(expected).count() == 0L)
    assert(expected.exceptAll(snap).count() == 0L)
    assert(snap.count() > 0L)
    // one row per key, and never a version that starts after the instant
    assert(snap.groupBy(col("o_custkey")).count()
      .filter(col("count") > 1).count() == 0L)
    assert(snap.filter(col("valid_from") > at).count() == 0L)
    history.unpersist()
  }
}
