package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable central-moment state — the distributed-statistics pattern
  * behind stddev/skewness/kurtosis at 100 TB: each partition (here: an
  * explicit shard column, to make the merge step visible and spec-able)
  * reduces to the bounded tuple (n, Σx, Σx², Σx³, Σx⁴); tuples merge by
  * plain addition (commutative + associative, so shard count and merge
  * order are irrelevant); the final pass derives the shape statistics
  * from the merged sums only. This is exactly how partial aggregation
  * already evaluates AVG/STDDEV inside Spark — surfaced as an explicit
  * two-level plan so the intermediate state itself can be persisted and
  * re-merged incrementally (the [[Rollup]] pattern, applied to higher
  * moments).
  *
  * Determinism: `l_quantity` is integer-valued (1..50), so x⁴ ≤ 6.25e6
  * and every power sum stays far below 2⁵³ — the sums are EXACT in
  * BIGINT regardless of row order, and the derived doubles come from one
  * fixed-order arithmetic expression over exactly-representable inputs,
  * identical in the DuckDB twin (sqrt·var instead of pow(var,1.5):
  * IEEE sqrt is correctly rounded everywhere, Math.pow is not).
  */
object Moments {

  private final val Shards = 16

  /** Per-(group, shard) bounded state: (n, s1..s4) as exact BIGINTs.
    * The shard expression is arbitrary — the merge result must not
    * depend on it (spec-pinned), which is the mergeability claim. */
  def partials(lineitem: DataFrame,
      shardExpr: Column = pmod(col("l_orderkey"), lit(Shards.toLong))): DataFrame = {
    val x = round(col("l_quantity")).cast("long")
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        shardExpr.as("shard"), x.as("x"))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("shard"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
  }

  /** Merge shard states by addition — order-free, restartable. */
  def merge(parts: DataFrame): DataFrame =
    parts.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), sum(col("s3")).as("s3"),
        sum(col("s4")).as("s4"))

  /** Population mean/variance/skewness/excess-kurtosis from merged sums.
    * One fixed-order double expression — the oracle twin repeats it
    * verbatim, so the doubles are bit-identical. */
  def finalize(merged: DataFrame): DataFrame = {
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val ex2 = col("s2").cast("double") / nd
    val ex3 = col("s3").cast("double") / nd
    val ex4 = col("s4").cast("double") / nd
    def m3(mean: Column, ex2: Column, ex3: Column): Column =
      ex3 - lit(3.0) * mean * ex2 + lit(2.0) * mean * mean * mean
    def m4(mean: Column, ex2: Column, ex3: Column, ex4: Column): Column =
      ex4 - lit(4.0) * mean * ex3 + lit(6.0) * mean * mean * ex2 -
        lit(3.0) * mean * mean * mean * mean
    val variance = ex2 - mean * mean
    merged.select(
      col("l_returnflag"), col("l_linestatus"), col("n").as("n_vals"),
      mean.as("mean_qty"),
      variance.as("var_qty"),
      (m3(mean, ex2, ex3) / (sqrt(variance) * variance)).as("skew_qty"),
      (m4(mean, ex2, ex3, ex4) / (variance * variance) - lit(3.0))
        .as("kurt_qty"))
  }

  def momentsMerged(lineitem: DataFrame): DataFrame =
    finalize(merge(partials(lineitem)))

  def qMomentsMerge(spark: SparkSession, dir: String): DataFrame =
    momentsMerged(Tables.lineitem(spark, dir))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def oMomentsMerge: String =
    """WITH x AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(round(l_quantity) AS BIGINT) AS x
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS n,
      |         sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
      |         sum(x*x*x*x) AS s4
      |  FROM x GROUP BY l_returnflag, l_linestatus),
      |d AS (
      |  SELECT l_returnflag, l_linestatus, n,
      |         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS ex2,
      |         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS ex3,
      |         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS ex4
      |  FROM s)
      |SELECT l_returnflag, l_linestatus, n AS n_vals,
      |       mean AS mean_qty,
      |       ex2 - mean * mean AS var_qty,
      |       (ex3 - 3.0 * mean * ex2 + 2.0 * mean * mean * mean)
      |         / (sqrt(ex2 - mean * mean) * (ex2 - mean * mean)) AS skew_qty,
      |       (ex4 - 4.0 * mean * ex3 + 6.0 * mean * mean * ex2
      |          - 3.0 * mean * mean * mean * mean)
      |         / ((ex2 - mean * mean) * (ex2 - mean * mean)) - 3.0 AS kurt_qty
      |FROM d ORDER BY l_returnflag, l_linestatus""".stripMargin
}
