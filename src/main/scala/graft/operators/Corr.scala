package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pearson correlation + least-squares regression as mergeable integer
  * sufficient statistics — the [[Moments]] discipline applied to PAIRED
  * variables: each group reduces to the bounded tuple
  * (n, Σx, Σy, Σx², Σy², Σxy) of exact BIGINTs (quantity is
  * integer-valued 1..50; discount becomes integer cents via the
  * DECIMAL(6,2) cast — the Tpch.scala path), the tuple merges by plain
  * addition in any order, and corr/slope/intercept come from ONE
  * fixed-order double expression over exactly-representable inputs —
  * bit-identical in the DuckDB twin (sqrt is correctly rounded; no pow,
  * no mean-centered streaming updates whose order would matter).
  *
  * Overflow headroom: with x ≤ 50, y ≤ 10 cents, every cross term
  * n·Σx² stays exact in BIGINT (< 2⁵³) up to ~3×10⁷ rows per group;
  * beyond that, the same sums promote to DECIMAL(38,0) (Spark) /
  * HUGEINT (DuckDB twin) with the division structure unchanged — the
  * bound is a property of these column magnitudes, not of the pattern.
  *
  * Scale shape (100 TB): one scan, map-side partial aggregation into 3
  * groups × 6 longs, a 3-row shuffle. Nothing else moves.
  */
object Corr {

  def corrRegression(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(col("l_returnflag"),
      col("l_quantity").cast("decimal(12,2)").cast("long").as("x"),
      (col("l_discount").cast("decimal(6,2)") * 100).cast("long").as("y"))
    val sums = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    sums
      .withColumn("cov_n",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("varx_n",
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("vary_n",
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
      .withColumn("corr_qty_disc",
        col("cov_n") / (sqrt(col("varx_n")) * sqrt(col("vary_n"))))
      .withColumn("slope_disc_per_qty", col("cov_n") / col("varx_n"))
      .withColumn("intercept_disc",
        (col("sy").cast("double") -
          col("cov_n") / col("varx_n") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col("l_returnflag"), col("n"),
        col("corr_qty_disc"), col("slope_disc_per_qty"), col("intercept_disc"))
  }

  def qCorrRegression(spark: SparkSession, dir: String): DataFrame =
    corrRegression(Tables.lineitem(spark, dir)).orderBy(col("l_returnflag"))

  def oCorrRegression: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS x,
      |    CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM b GROUP BY l_returnflag),
      |d AS (
      |  SELECT *, CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n,
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS varx_n,
      |    CAST(n * syy - sy * sy AS DOUBLE) AS vary_n
      |  FROM s)
      |SELECT l_returnflag, n,
      |  cov_n / (sqrt(varx_n) * sqrt(vary_n)) AS corr_qty_disc,
      |  cov_n / varx_n AS slope_disc_per_qty,
      |  (CAST(sy AS DOUBLE) - cov_n / varx_n * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS intercept_disc
      |FROM d ORDER BY l_returnflag""".stripMargin
}
