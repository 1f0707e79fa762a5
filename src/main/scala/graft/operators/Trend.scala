package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-group trend slopes and hierarchical shares — two rollup-grade
  * reporting primitives in exact arithmetic.
  *
  * 1. DAILY TREND per event type: the OLS slope of daily counts over
  *    the day index — "growing or declining, and how fast" — from the
  *    same exact integer sufficient statistics as [[Corr]], finalized
  *    as ⌊1000·(n·Σxy − ΣxΣy)/(n·Σx² − Σx²)⌋ via one exact-floor double
  *    division (identical in both engines, negatives included: floor,
  *    not truncation, on both sides).
  *
  * 2. SHARE OF PARENT: revenue by region/nation with each nation's
  *    share of its region in basis points — integer e4-unit
  *    cross-multiplication and integral division only (the
  *    [[Pareto.supplierPareto]] discipline on a hierarchy level).
  */
object Trend {

  def dailyTrend(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val withX = daily
      .withColumn("x", datediff(col("day"),
        min(col("day")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")))).cast("long"))
    withX.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("slope_milli",
        floor((lit(1000L) * (col("n") * col("sxy") - col("sx") * col("sy")))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx"))).cast("long"))
      .select(col("event_type"), col("n").as("n_days"), col("sy").as("total"),
        col("slope_milli"))
  }

  def qDailyTrend(spark: SparkSession, dir: String): DataFrame =
    dailyTrend(Tables.events(spark, dir)).orderBy(col("event_type"))

  def oDailyTrend: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT event_type, y,
      |    CAST(date_diff('day', min(day) OVER (PARTITION BY event_type), day)
      |      AS BIGINT) AS x
      |  FROM d),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM x GROUP BY 1)
      |SELECT event_type, n AS n_days, sy AS total,
      |  CAST(floor(CAST(1000 * (n * sxy - sx * sy) AS DOUBLE)
      |    / (n * sxx - sx * sx)) AS BIGINT) AS slope_milli
      |FROM s ORDER BY event_type""".stripMargin

  // ------------------------------------------------- share of parent

  def shareOfParent(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val rev = lineitem
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1) - col("l_discount").cast("decimal(6,2)"))).as("r"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(col("r")) * 10000).cast("decimal(38,0)").as("rev_e4"))
    val parent = rev.groupBy(col("r_name"))
      .agg(sum(col("rev_e4")).cast("decimal(38,0)").as("region_e4"))
    rev.join(broadcast(parent), Seq("r_name"))
      .withColumn("share_bp", expr("(rev_e4 * 10000) div region_e4"))
      .select(col("r_name"), col("n_name"),
        (col("rev_e4").cast("double") / 10000).as("revenue"),
        col("share_bp"))
  }

  def qShareOfParent(spark: SparkSession, dir: String): DataFrame =
    shareOfParent(Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
      Tables.nation(spark, dir), Tables.region(spark, dir))
      .orderBy(col("r_name"), col("n_name"))

  def oShareOfParent: String =
    """WITH rev AS (
      |  SELECT r.r_name, n.n_name,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |      * (1 - CAST(l_discount AS DECIMAL(6,2)))) * 10000
      |      AS DECIMAL(38,0)) AS HUGEINT) AS rev_e4
      |  FROM lineitem
      |  JOIN supplier s ON l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |p AS (SELECT r_name, sum(rev_e4) AS region_e4 FROM rev GROUP BY 1)
      |SELECT rev.r_name, rev.n_name,
      |  CAST(rev.rev_e4 AS DOUBLE) / 10000 AS revenue,
      |  CAST((rev.rev_e4 * 10000) // p.region_e4 AS BIGINT) AS share_bp
      |FROM rev JOIN p USING (r_name)
      |ORDER BY 1, 2""".stripMargin
}
