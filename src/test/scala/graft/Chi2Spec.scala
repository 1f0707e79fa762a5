package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Chi2

class Chi2Spec extends SparkSpecBase {
  import spark.implicits._

  // Mon Feb 5 2024 (weekday) and Sat Feb 3 2024 (weekend)
  private val wd = Timestamp.valueOf("2024-02-05 12:00:00")
  private val we = Timestamp.valueOf("2024-02-03 12:00:00")

  test("perfectly proportional table has zero chi2 everywhere") {
    // both types split 3:1 weekday:weekend — independence exactly holds
    val events = (Seq.fill(3)(("a", wd)) ++ Seq(("a", we)) ++
      Seq.fill(6)(("b", wd)) ++ Seq.fill(2)(("b", we)))
      .toDF("event_type", "ts")
    val out = Chi2.weekendIndependence(events).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("chi2_contrib") == 0.0, r.toString)
      assert(r.getAs[Double]("exp_weekday") == r.getAs[Long]("n_weekday").toDouble)
    }
  }

  test("hand-computed 2x2 contribution") {
    // a: (3 wd, 1 we), b: (1 wd, 3 we) → N=8, C=4/4, R=4 each
    // d_wd(a) = 3*8 − 4*4 = 8; contrib(a) = 64/128 + 64/128 = 1.0
    val events = (Seq.fill(3)(("a", wd)) ++ Seq(("a", we)) ++
      Seq(("b", wd)) ++ Seq.fill(3)(("b", we)))
      .toDF("event_type", "ts")
    val out = Chi2.weekendIndependence(events).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("chi2_contrib")).toMap
    assert(out == Map("a" -> 1.0, "b" -> 1.0), out.toString)
  }

  test("fixture: marginals reconcile and contributions are non-negative") {
    val out = Chi2.qWeekendIndependence(spark, sf).cache()
    val n = out.agg(sum(col("n_weekday") + col("n_weekend"))).head().getLong(0)
    assert(n == Tables.events(spark, sf).count())
    assert(out.filter(col("chi2_contrib") < 0).count() == 0)
    // expected counts sum to observed marginals per row (within an ulp)
    val bad = out.filter(abs(col("exp_weekday") + col("exp_weekend") -
      (col("n_weekday") + col("n_weekend")).cast("double")) > 1e-6).count()
    assert(bad == 0)
  }
}
