package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-H-style analytical queries over the star-schema fixtures.
  *
  * Numeric discipline for oracle parity: double columns that feed SUM/AVG
  * are cast to narrow decimals first (exact, order-independent), summed in
  * decimal, and the final result cast back to double. Plain SUM(double) is
  * order-dependent in the last bits and would hash-mismatch DuckDB.
  * Averages are computed as CAST(sum_decimal AS DOUBLE)/count so both
  * engines perform the identical double division.
  */
object Tpch {

  /** money/quantity → exact decimal (source data has ≤2 decimal digits) */
  private def dq(c: Column): Column = c.cast(DecimalType(12, 2))  // quantity
  private def dp(c: Column): Column = c.cast(DecimalType(14, 2))  // price
  private def dr(c: Column): Column = c.cast(DecimalType(6, 2))   // rate (disc/tax)

  /** Pricing summary report (TPC-H Q1 shape): scan-heavy partial+final
    * hash aggregate; at 100 TB this is a single pass over lineitem with
    * map-side combine into 4 groups — no skew risk, shuffle is 4 rows/task.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dq(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dp(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount")))
          * (lit(1) + dr(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dq(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dp(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dr(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) * (1 + CAST(l_tax AS DECIMAL(6,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
