package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Equi-depth (quantile-bucket) histograms per event type — the
  * data-profiling complement to [[Monitor]]'s fixed-edge histograms:
  * fixed edges answer "how many in [0,10)?", equi-depth answers "where
  * do the deciles sit?" and adapts to any distribution without edge
  * tuning (it is also exactly the statistic a cost-based optimizer
  * keeps per column).
  *
  * Exactness: bucket assignment is pure integer arithmetic on exact
  * ranks — row r of n lands in bucket ⌊(r−1)·B/n⌋ — and per-bucket
  * min/max/count are exact; the only doubles are value edges already
  * stored as doubles. Ranks are per-type windows: GROUP partitioning
  * bounds window tasks (the [[Mining.boxplot]] argument), so no global
  * sort exists to avoid; for a single giant group the rank swaps onto
  * [[Scale.globalRank]] unchanged. */
object Profile {

  val Buckets = 10

  def equiDepth(events: DataFrame, buckets: Int = Buckets): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("bucket",
        expr(s"((rnk - 1) * $buckets) div n").cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"))
  }

  def qEquiDepth(spark: SparkSession, dir: String): DataFrame =
    equiDepth(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("bucket"))

  /** Order→ship latency distribution per order priority: count, exact
    * mean surrogate ⌊1000·Σlag/n⌋, and EXACT p50/p90 by integer
    * selection ranks ((n+1) div 2 and (9n+9) div 10 = ⌈p·n⌉) inside the
    * per-priority window — the ops-SLA rollup over the fact↔dim join.
    * The join shuffles on orderkey (fact-fact shape); everything after
    * is bounded-group windows and a 5-row aggregate. */
  def shipLatency(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val base = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("lag_days"), col("l_orderkey"), col("l_linenumber"))
    base
      .withColumn("rnk", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        floor(sum(col("lag_days")) * lit(1000L).cast("double") / count(lit(1)))
          .cast("long").as("mean_milli"),
        max(when(col("rnk") === expr("(n + 1) div 2"), col("lag_days")))
          .as("p50_days"),
        max(when(col("rnk") === expr("(9 * n + 9) div 10"), col("lag_days")))
          .as("p90_days"))
  }

  def qShipLatency(spark: SparkSession, dir: String): DataFrame =
    shipLatency(Tables.lineitem(spark, dir), Tables.orders(spark, dir))
      .orderBy(col("o_orderpriority"))

  def oShipLatency: String =
    """WITH b AS (
      |  SELECT o_orderpriority,
      |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days,
      |    l_orderkey, l_linenumber
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY lag_days, l_orderkey, l_linenumber) AS rnk,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM b)
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(floor(sum(lag_days) * CAST(1000 AS DOUBLE) / count(*)) AS BIGINT)
      |    AS mean_milli,
      |  CAST(max(CASE WHEN rnk = (n + 1) // 2 THEN lag_days END) AS BIGINT)
      |    AS p50_days,
      |  CAST(max(CASE WHEN rnk = (9 * n + 9) // 10 THEN lag_days END) AS BIGINT)
      |    AS p90_days
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  def oEquiDepth: String =
    s"""WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rnk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  CAST((rnk - 1) * $Buckets // n AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  min(value) AS lo, max(value) AS hi
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
