package graft

import org.apache.spark.sql.functions._

import graft.operators.Diagnostics

class DiagnosticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("benford: digit extraction is exact; shares partition to ~1000 milli") {
    val orders = Seq(123.45, 19.99, 950.00, 2.50, 123456.78, 1.00)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
    val out = Diagnostics.benfordFirstDigit(orders).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1" -> 4L, "2" -> 1L, "9" -> 1L), out.toString)
    val fix = Diagnostics.qBenford(spark, sf).cache()
    val s = fix.agg(sum(col("share_milli"))).head().getLong(0)
    assert(s <= 1000 && s > 1000 - 9, s"shares sum $s")
    assert(fix.filter(col("dev_milli") =!=
      abs(col("share_milli") - col("benford_milli"))).count() == 0)
  }

  test("skew report: a planted hot key dominates and sizes the salt factor") {
    // 1 key with 90 rows, 9 keys with 1 row → mean 9.9, max/mean ≈ 9.09
    val fact = ((0 until 90).map(_ => 7L) ++ (11L to 19L))
      .toDF("l_suppkey")
    val out = Diagnostics.joinSkewReport(fact, "l_suppkey").collect()
    val hot = out.head
    assert(hot.getLong(0) == 7L && hot.getLong(1) == 90L)
    // mean_milli = 99*1000/10 = 9900; skew = 90*1000*10/99 = 9090
    assert(hot.getLong(2) == 9900L && hot.getLong(3) == 9090L, hot.toString)
    // salt = ceil(90*10/99) = ceil(9.09) = 10
    assert(hot.getLong(4) == 10L)
    // a uniform key needs no salt
    val uni = Diagnostics.joinSkewReport(
      (1L to 100L).flatMap(k => Seq.fill(3)(k)).toDF("l_suppkey"), "l_suppkey")
      .collect()
    assert(uni.forall(_.getLong(4) == 1L), "uniform keys must report salt 1")
  }
}
