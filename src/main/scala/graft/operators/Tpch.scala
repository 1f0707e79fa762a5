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

  /** Shipping-priority (TPC-H Q3 shape): broadcast the filtered customer
    * dim into orders, shuffle-join lineitem on orderkey, top-10 revenue.
    * At scale: customer filter cuts ~1/5, broadcast leaves lineitem
    * unshuffled until the orderkey join, which buckets co-locate. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame =
    q3On(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir))

  /** Q3 over caller-supplied tables — [[graft.operators.Scale.q3Bucketed]]
    * feeds the bucketed fact layout through the identical plan. */
  def q3On(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame): DataFrame = {
    val cutoff = lit("1998-06-30").cast("timestamp")
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
    val ord = orders.filter(col("o_orderdate") < cutoff)
    val li = lineitem.filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3OracleSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Local-supplier revenue (TPC-H Q5 shape): five-way join; all four
    * dimension legs broadcast, the single shuffle is orders ⋈ lineitem. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def q5OracleSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Order-priority check (TPC-H Q4 shape, adapted to the fixture's
    * columns: "late" = a line shipped >90 days after the order date).
    * The correlated EXISTS decorrelates to a left-semi join whose
    * condition mixes the equi key with a theta comparison — the semi
    * side never materializes lineitem columns. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  def q4OracleSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Returned-item report (TPC-H Q10 shape): revenue lost to returns per
    * customer over a quarter, top 20. Fact⋈fact shuffle on orderkey,
    * customer/nation broadcast, TakeOrderedAndProject for the top-k. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-10-01").cast("timestamp")
        && col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  def q10OracleSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1999-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Forecasting-revenue change (TPC-H Q6 shape): pure scan + filter +
    * ungrouped aggregate — the pushdown showcase. All three predicates
    * reach the parquet reader; the aggregate is a one-row map-side
    * combine, so the shuffle moves 32 partial rows. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.04, 0.06)
        && col("l_quantity") < 24)
      .agg(sum(dp(col("l_extendedprice")) * dr(col("l_discount")))
        .cast("double").as("revenue"))

  def q6OracleSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.06
      |  AND l_quantity < 24""".stripMargin

  /** Promotion-revenue share (TPC-H Q14 shape): conditional aggregate
    * ratio over a fact⋈dim join; part broadcasts, lineitem never
    * shuffles. Both sums are exact decimals; the final ratio is one
    * double division in both engines. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    val part = Tables.part(spark, dir)
    val disc = dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount")))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast(DecimalType(14, 2))))
          .cast("double").as("promo_revenue"),
        sum(disc).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  def q14OracleSql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS total_revenue,
      |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  /** Top supplier (TPC-H Q15 shape): aggregated CTE + scalar-subquery
    * max, re-joined against itself. The revenue stays DECIMAL through
    * the equality (exact compare — a double here would be flaky), and
    * the max side is one broadcast row. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
        .as("rev_dec"))
    val top = rev.join(broadcast(rev.agg(max(col("rev_dec")).as("mx"))),
      col("rev_dec") === col("mx"))
    top.join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  def q15OracleSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Discounted-revenue brackets (TPC-H Q19 shape, container predicates
    * dropped with the fixture's columns): a disjunction of
    * brand/size/quantity brackets over the part join. The OR of ANDs
    * stays a single scan — Catalyst pushes the common l_quantity bounds
    * and evaluates the residual disjunction post-join. */
  def q19BracketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val bracket =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
        && col("l_quantity").between(20, 30))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  def q19OracleSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Dormant high-balance customers (TPC-H Q22 shape, phone prefixes
    * replaced by the fixture's nation key): scalar subquery for the
    * positive-balance average (exact decimal sum / count → one double
    * division), anti join against the final year's orders, grouped
    * count+sum. */
  def q22DormantBalance(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double")
        / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  def q22OracleSql: String =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

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
