package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Exprs

/** Join inventory over the star schema (SURVEY §2.3: the reference has no
  * joins of its own; these are the engine-level capabilities scheduled by
  * §7, sized for a 1000-executor cluster).
  *
  * Strategy notes:
  *  - Dimensions (region/nation/part/supplier/customer at fact scale) are
  *    broadcast explicitly — the probe side streams with zero shuffle.
  *  - Fact-to-fact (orders ⋈ lineitem) is a shuffle join on the join key;
  *    at 100 TB both sides would be bucketed by orderkey so the exchange
  *    disappears (see sources.Bucketing).
  *  - Semi/anti joins use left_semi/left_anti so the right side is only
  *    hashed on its key — never materialized into the output.
  */
object Joins {

  private def dp(c: org.apache.spark.sql.Column) = c.cast(DecimalType(14, 2))
  private def dr(c: org.apache.spark.sql.Column) = c.cast(DecimalType(6, 2))
  private def revenue = dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount")))

  /** Broadcast-hash join: fact ⋈ small dim, revenue by brand. */
  def qBrandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(revenue).cast("double").as("revenue"),
        sum(Exprs.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("line_count"))
      .orderBy(col("p_brand"))

  def oBrandRevenue: String =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS line_count
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Shuffle join of the two larger tables, rolled up by segment. */
  def qSegmentSales(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(dp(col("o_totalprice"))).cast("double").as("total_sales"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  def oSegmentSales: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_sales,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-semi: customers with ≥1 order in 2001 (EXISTS). */
  def qActiveCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .orderBy(col("c_custkey"))

  def oActiveCustomers: String =
    """SELECT * FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti: customers with NO order in 2001 (NOT EXISTS) — the
    * idempotent-load building block (SURVEY §7.1: anti-join replaces the
    * reference's duplicate-key-error swallowing, gold_loader.py:313-316). */
  def qDormantCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy(col("c_custkey"))

  def oDormantCustomers: String =
    """SELECT * FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Ranking window: top-3 orders per customer by price (W1-family). */
  def qTopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rank_in_customer", row_number().over(w))
      .filter(col("rank_in_customer") <= 3)
      .orderBy(col("o_custkey"), col("rank_in_customer"))
  }

  def oTopOrdersPerCustomer: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |       o_orderpriority, CAST(rank_in_customer AS INTEGER) AS rank_in_customer
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |  ) AS rank_in_customer FROM orders
      |) WHERE rank_in_customer <= 3
      |ORDER BY o_custkey, rank_in_customer""".stripMargin

  /** Global top-k with deterministic tiebreak (TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver, no full sort). */
  def qTop10Orders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  def oTop10Orders: String =
    """SELECT * FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Full-outer reconciliation — the one join type the other queries
    * never exercise as a result shape: per-day order placements vs
    * line shipments, keeping days present on either side only (the
    * shipment calendar extends months past the last order date). Both
    * inputs pre-aggregate to #days rows BEFORE the full-outer join, so
    * the join itself is calendar-sized at any data scale. */
  def qDailyReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val placed = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("orders_placed"))
    val shipped = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(count(lit(1)).as("lines_shipped"))
    placed.join(shipped, Seq("d"), "full_outer")
      .select(col("d"),
        col("orders_placed").isNotNull.as("has_orders"),
        col("lines_shipped").isNotNull.as("has_shipments"),
        coalesce(col("orders_placed"), lit(0L)).as("orders_placed"),
        coalesce(col("lines_shipped"), lit(0L)).as("lines_shipped"))
      .orderBy(col("d"))
  }

  def oDailyReconciliation: String =
    """WITH placed AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS orders_placed
      |  FROM orders GROUP BY 1),
      |shipped AS (
      |  SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS lines_shipped
      |  FROM lineitem GROUP BY 1)
      |SELECT d,
      |  orders_placed IS NOT NULL AS has_orders,
      |  lines_shipped IS NOT NULL AS has_shipments,
      |  COALESCE(orders_placed, 0) AS orders_placed,
      |  COALESCE(lines_shipped, 0) AS lines_shipped
      |FROM placed FULL JOIN shipped USING (d)
      |ORDER BY d""".stripMargin
}
