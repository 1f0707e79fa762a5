package graft

import org.apache.spark.sql.functions._

import graft.operators.Regress

class RegressSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact planted linear data is recovered with zero residual") {
    // y_e4 = 7 + 3*n_items + 11*sum_qty on 4 independent points
    val feats = Seq((1L, 1L, 2L), (2L, 2L, 3L), (3L, 3L, 5L), (4L, 5L, 8L))
      .map { case (k, n, q) => (k, n, q, 7L + 3 * n + 11 * q) }
      .toDF("o_orderkey", "n_items", "sum_qty", "y_e4")
    val c = Regress.train(feats)
    assert(c.toSeq == Seq(7000000L, 3000000L, 11000000L), c.toSeq)
    val out = Regress.predict(feats, c)
    assert(out.agg(max(abs(col("residual")))).head().getDouble(0) == 0.0)
  }

  test("negative coefficients round sign-safely") {
    // y = 10 − 2*n + 0*q → c1 must be exactly −2e6, not an off-by-one
    // truncation toward zero
    val feats = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 4L, 4L), (4L, 7L, 9L))
      .map { case (k, n, q) => (k, n, q, 10L - 2 * n) }
      .toDF("o_orderkey", "n_items", "sum_qty", "y_e4")
    val c = Regress.train(feats)
    assert(c.toSeq == Seq(10000000L, -2000000L, 0L), c.toSeq)
  }

  test("fixture model beats the mean predictor (R-squared positive)") {
    val out = Regress.qRegressOrderTotal(spark, sf).cache()
    val stats = out.agg(
      sum(col("residual") * col("residual")).as("ssres"),
      avg(col("actual_total")).as("mu")).head()
    val mu = stats.getDouble(1)
    val sstot = out.agg(sum(pow(col("actual_total") - mu, 2))).head().getDouble(0)
    assert(stats.getDouble(0) < sstot,
      s"SSres ${stats.getDouble(0)} not below SStot $sstot")
    // predictions track actuals: correlation of signs of deviations
    assert(out.count() > 0)
  }
}
