package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Deeper TPC-H query shapes: correlated scalar subqueries, self-referencing
  * aggregates, two-copy dimension joins, outer-join distributions, and
  * conditional-count pivots. The fixture star schema has no `partsupp`,
  * `l_shipmode`, or `l_commitdate` (TESTDATA.md), so those shapes are
  * adapted onto lineitem-derived proxies — the *plan* shapes (decorrelated
  * min, double-aggregation, dual broadcast of one dim) are the point.
  *
  * Numeric discipline matches [[Tpch]]: decimal intermediates for every
  * SUM, one final double cast, so DuckDB hash-compare is exact.
  */
object TpchDeep {

  private def dq(c: Column): Column = c.cast(DecimalType(12, 2))  // quantity
  private def dp(c: Column): Column = c.cast(DecimalType(14, 2))  // price
  private def dr(c: Column): Column = c.cast(DecimalType(6, 2))   // rate

  /** Min-cost supplier (TPC-H Q2 shape). `partsupp` is synthesized as the
    * per-(part, supplier) minimum observed unit price over lineitem — one
    * shuffle on the composite key with map-side combine. The correlated
    * "cost = MIN(cost) over this part" subquery decorrelates into a
    * broadcast join against a 16-row per-part-min aggregate; the part
    * filter (size=15, MEDIUM) is applied BEFORE the min aggregation via a
    * broadcast semi-join, so at 100 TB the second aggregate sees only the
    * ~0.1% of pairs belonging to surviving parts. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_size") === 15 && col("p_type") === "MEDIUM")
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
      .join(broadcast(parts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val mins = ps.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("supply_cost")).as("min_cost"))
    ps.join(broadcast(mins),
        col("l_partkey") === col("m_partkey")
          && col("supply_cost") === col("min_cost"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("s_suppkey"), col("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  def q2OracleSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey, supply_cost
      |FROM ps
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size = 15 AND p_type = 'MEDIUM'
      |  AND supply_cost = (SELECT MIN(ps2.supply_cost) FROM ps ps2
      |                     WHERE ps2.l_partkey = p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
      |LIMIT 100""".stripMargin

  /** Volume shipping between two nations (TPC-H Q7 shape): the same
    * 25-row nation dim joins TWICE under different roles (supplier's
    * nation and customer's nation) — both broadcast, zero extra shuffle.
    * The only shuffle is lineitem ⋈ orders on orderkey; the nation-pair
    * disjunction is evaluated post-broadcast where it prunes to ~2/625
    * of rows before the aggregate. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  def q7OracleSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** National market share (TPC-H Q8 shape): the share of one supplier
    * nation's revenue within a customer region's market for one part
    * type, per year. Ratio of two conditional decimal sums → one double
    * division in both engines. Every dimension leg broadcasts; the
    * nation dim again appears in two roles (customer-side restricted to
    * the region, supplier-side only labelling the numerator). */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val vol = dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount")))
    val custNationInEurope = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select(col("n_nationkey").as("cn_key"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_type") === "STANDARD")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNationInEurope), col("c_nationkey") === col("cn_key"), "left_semi")
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", vol)
          .otherwise(lit(0).cast(DecimalType(14, 2)))).cast("double").as("nation_volume"),
        sum(vol).cast("double").as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy(col("o_year"))
  }

  def q8OracleSql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
      |    THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS nation_volume,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS total_volume,
      |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
      |    THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'EUROPE'
      |  AND p_type = 'STANDARD'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Product-type profit (TPC-H Q9 shape). `ps_supplycost` is proxied as
    * 60% of the part's retail price; profit = discounted revenue minus
    * quantity × cost, grouped by supplier nation × ship year. The part
    * name LIKE filter lands on the broadcast side (260 of 5k parts);
    * decimal subtraction keeps both engines bit-exact. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val amount = dp(col("l_extendedprice")) * (lit(1) - dr(col("l_discount"))) -
      dp(col("p_retailprice")) * dq(col("l_quantity")) * lit(BigDecimal("0.60")).cast(DecimalType(4, 2))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_name").like("%gear%"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  def q9OracleSql: String =
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |    - CAST(p_retailprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.60 AS DECIMAL(4,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY n_name, year(l_shipdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Late-shipment priority split (TPC-H Q12 shape; `l_shipmode` absent,
    * the categorical split is order priority instead). Conditional
    * integer counts inside one aggregate — the CASE evaluates
    * post-broadcast, so the plan is scan → broadcast join → partial
    * agg → 2-row exchange. */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(high, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  def q12OracleSql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
}
