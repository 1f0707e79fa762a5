package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline: the distributed prefix-max frontier must equal the O(n²)
  * dominance definition exactly, including both tie rules (equal points
  * all kept; same-cost worse-gain dropped) and across range-partition
  * boundaries. */
class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  // (key, cost, gain) — minimize cost, maximize gain
  private val pts = Seq(
    (1L, 10.0, 5L), // frontier (cheapest overall)
    (2L, 10.0, 5L), // identical twin of 1 — equal points never dominate
    (3L, 10.0, 3L), // same cost as 1, worse gain -> dominated
    (4L, 20.0, 9L), // frontier
    (5L, 20.0, 9L), // identical twin of 4
    (6L, 25.0, 9L), // equal gain at higher cost -> dominated by 4
    (7L, 30.0, 12L), // frontier
    (8L, 35.0, 11L), // dominated by 7 (worse on both)
    (9L, 40.0, 12L), // equal gain at higher cost -> dominated by 7
    (10L, 50.0, 20L)) // frontier (most gain)
    .toDF("k", "cost", "gain")

  private def bruteFrontier(rows: Seq[(Long, Double, Long)]): Set[Long] =
    rows.filter { case (_, c, g) =>
      !rows.exists { case (_, qc, qg) =>
        qc <= c && qg >= g && (qc < c || qg > g) }
    }.map(_._1).toSet

  test("frontier equals the dominance definition, with both tie rules") {
    // nPartitions deliberately > #levels exercises empty range partitions
    for (n <- Seq(1, 3, 16)) {
      val got = Skyline.frontier2d(pts, "k", "cost", "gain", nPartitions = n)
        .select("k").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 4L, 5L, 7L, 10L), s"nPartitions=$n")
    }
  }

  test("dominance counts match the strict definition") {
    val f = Skyline.frontier2d(pts, "k", "cost", "gain", nPartitions = 3)
    val got = Skyline.withDominanceCounts(f, pts, "cost", "gain")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // key 1 (10,5) strictly dominates 3 (10,3) only — its twin 2 is equal
    assert(got(1L) == 1L && got(2L) == 1L)
    // key 4 (20,9) dominates 6 (25,9) only — 3 is CHEAPER, twins are equal
    assert(got(4L) == 1L && got(5L) == 1L)
    // key 7 (30,12) dominates 8 (35,11) and 9 (40,12)
    assert(got(7L) == 2L)
    // key 10 (50,20) dominates nothing (everything is cheaper)
    assert(got(10L) == 0L)
  }

  test("level window stays partition-local — never a global sort") {
    val p = pts.select(col("k"), col("cost"), col("gain"))
    val lv = Skyline.costLevels(p, 3)
    val plan = Skyline.frontierOfLevels(lv, Seq((0, None), (1, Some(5L)),
        (2, Some(9L))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"no window in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"level window collapsed to a single partition:\n$plan")
  }

  test("fixture frontier is exactly the brute-force set with counts") {
    val raw = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val expect = bruteFrontier(raw)
    val rows = operators.Skyline.qPartSkyline(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expect)
    assert(rows.nonEmpty)
    // every returned count matches a direct strict-dominance scan
    rows.foreach { r =>
      val (c, g) = (r.getDouble(1), r.getLong(2))
      val n = raw.count { case (_, qc, qg) =>
        c <= qc && g >= qg && (c < qc || g > qg) }
      assert(r.getLong(3) == n, s"key ${r.getLong(0)}")
    }
  }
}
