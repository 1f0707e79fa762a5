package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pivot (long→wide) and unpivot (wide→long) — the reshaping pair every
  * BI export needs. The pivot is Spark's native `pivot(col, values)`
  * with the value list PINNED: an unpinned pivot runs an extra distinct
  * pass to discover the columns and — worse at 100 TB — makes the output
  * schema data-dependent, so any downstream consumer breaks when a new
  * category appears. The twin spells the same pinned list as portable
  * CASE aggregation (what pivot compiles to underneath).
  *
  * Scale shape: one scan, partial+final hash aggregate to #years ×
  * #priorities cells, then the unpivot is a zero-shuffle generator
  * expression (`stack`) over the tiny wide table. */
object Pivot {

  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  /** Orders per year × priority, one column per priority. */
  def orderPriorityPivot(orders: DataFrame): DataFrame =
    orders
      .select(year(col("o_orderdate")).as("order_year"), col("o_orderpriority"))
      .groupBy(col("order_year"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
      // a year with zero orders of some priority pivots to NULL; counts
      // must read 0 (and match the twin's CASE-sum, which also needs the
      // explicit coalesce since SUM over an empty CASE set is NULL)
      .select(col("order_year") +: Priorities.map(p =>
        coalesce(col(s"`$p`"), lit(0L)).as(colName(p))): _*)

  private def colName(p: String): String =
    "n_" + p.toLowerCase.replaceAll("[^a-z0-9]+", "_")

  def qOrderPriorityPivot(spark: SparkSession, dir: String): DataFrame =
    orderPriorityPivot(Tables.orders(spark, dir)).orderBy(col("order_year"))

  def oOrderPriorityPivot: String = {
    val cells = Priorities.map(p =>
      s"CAST(coalesce(sum(CASE WHEN o_orderpriority = '$p' THEN 1 END), 0) " +
        s"AS BIGINT) AS ${colName(p)}").mkString(",\n      |  ")
    raw"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
      |  $cells
      |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin
  }

  /** Round-trip unpivot of the wide table back to (year, priority, n) —
    * `stack` is a generator (map-only, no shuffle); rows with n = 0 are
    * kept, so pivot→unpivot is lossless against the dense grid. */
  def orderPriorityUnpivot(wide: DataFrame): DataFrame = {
    val stackArgs = Priorities.map(p =>
      s"'$p', ${colName(p)}").mkString(", ")
    wide.select(col("order_year"),
      expr(s"stack(${Priorities.size}, $stackArgs) AS (o_orderpriority, n)"))
      .select(col("order_year"), col("o_orderpriority"), col("n"))
  }

  def qOrderPriorityUnpivot(spark: SparkSession, dir: String): DataFrame =
    orderPriorityUnpivot(orderPriorityPivot(Tables.orders(spark, dir)))
      .orderBy(col("order_year"), col("o_orderpriority"))

  def oOrderPriorityUnpivot: String =
    raw"""WITH y AS (
      |  SELECT DISTINCT year(CAST(o_orderdate AS DATE)) AS order_year
      |  FROM orders),
      |p AS (SELECT unnest(['1-URGENT', '2-HIGH', '3-MEDIUM',
      |                     '4-NOT SPECIFIED', '5-LOW']) AS o_orderpriority),
      |c AS (
      |  SELECT year(CAST(o_orderdate AS DATE)) AS order_year,
      |         o_orderpriority, count(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT CAST(y.order_year AS INTEGER) AS order_year, p.o_orderpriority,
      |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |FROM y CROSS JOIN p
      |LEFT JOIN c ON c.order_year = y.order_year
      |  AND c.o_orderpriority = p.o_orderpriority
      |ORDER BY 1, 2""".stripMargin
}
