package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corr, Pivot}

class CorrPivotSpec extends SparkSpecBase {
  import spark.implicits._

  test("corr/regression: hand-computed perfect and anti-correlated fixtures") {
    // y = 2x exactly → corr 1, slope 2 (in cent units), intercept 0
    val perfect = Seq((1.0, 0.02), (2.0, 0.04), (3.0, 0.06))
      .toDF("l_quantity", "l_discount")
      .withColumn("l_returnflag", lit("A"))
    val r = Corr.corrRegression(perfect).collect().head
    // sqrt(varx)*sqrt(vary) is not exactly cov even for exact data —
    // |corr| can exceed 1 by an ulp; the value is still deterministic
    // and engine-identical (both compute the same IEEE expression)
    assert(math.abs(r.getAs[Double]("corr_qty_disc") - 1.0) < 1e-12)
    assert(r.getAs[Double]("slope_disc_per_qty") == 2.0)
    assert(r.getAs[Double]("intercept_disc") == 0.0)
    // y = -x + 4 → corr −1
    val anti = Seq((1.0, 0.03), (2.0, 0.02), (3.0, 0.01))
      .toDF("l_quantity", "l_discount")
      .withColumn("l_returnflag", lit("B"))
    val r2 = Corr.corrRegression(anti).collect().head
    assert(math.abs(r2.getAs[Double]("corr_qty_disc") + 1.0) < 1e-12)
    assert(r2.getAs[Double]("slope_disc_per_qty") == -1.0)
    assert(r2.getAs[Double]("intercept_disc") == 4.0)
  }

  test("corr on the fixture stays in [-1, 1] and groups cover the flags") {
    val out = Corr.qCorrRegression(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet == Set("A", "N", "R"))
    out.foreach { r =>
      val c = r.getAs[Double]("corr_qty_disc")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr $c out of range")
    }
  }

  test("pivot is dense (no nulls), counts reconcile, unpivot round-trips") {
    val wide = Pivot.qOrderPriorityPivot(spark, sf).cache()
    val counts = wide.columns.filter(_.startsWith("n_"))
    assert(counts.length == 5)
    // dense zeros, never null
    counts.foreach(c => assert(wide.filter(col(c).isNull).count() == 0))
    // total across cells equals the order count
    val total = wide.select(counts.map(c => sum(col(c))).reduce(_ + _))
      .head().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
    // unpivot(pivot(x)) equals the dense year×priority grid
    val long = Pivot.qOrderPriorityUnpivot(spark, sf)
    assert(long.count() == wide.count() * 5)
    val fromWide = wide.collect().flatMap { r =>
      counts.map(c => (r.getInt(0), c, r.getAs[Long](c)))
    }.toSet
    val fromLong = long.collect().map { r =>
      (r.getInt(0), "n_" + r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", "_"),
        r.getLong(2))
    }.toSet
    assert(fromWide == fromLong)
  }
}
