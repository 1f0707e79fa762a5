package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Referential-integrity scanning across the star schema and
  * gaps-and-islands streak analysis over the event stream.
  */
object Integrity {

  /** Long-format FK audit: for each declared relationship, child row
    * count, orphan count (children whose key misses the parent), and
    * the verdict. Each orphan leg is one left-anti join with the parent
    * side broadcast when dimension-sized; counts are one-row partials.
    * The warehouse twin of [[Expectations.report]]'s single-table
    * contract — this one crosses tables. */
  def referentialAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def leg(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val total = child.agg(count(lit(1)).as("n_rows"))
      val orphans = child
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      total.crossJoin(orphans)
        .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"),
          (col("n_orphans") === 0L).as("ok"))
    }
    Seq(
      leg("lineitem.l_orderkey -> orders", Tables.lineitem(spark, dir),
        "l_orderkey", Tables.orders(spark, dir), "o_orderkey"),
      leg("orders.o_custkey -> customer", Tables.orders(spark, dir),
        "o_custkey", Tables.customer(spark, dir), "c_custkey"),
      leg("customer.c_nationkey -> nation", Tables.customer(spark, dir),
        "c_nationkey", Tables.nation(spark, dir), "n_nationkey"),
      leg("supplier.s_nationkey -> nation", Tables.supplier(spark, dir),
        "s_nationkey", Tables.nation(spark, dir), "n_nationkey"))
      .reduce(_ unionByName _)
  }

  def qReferential(spark: SparkSession, dir: String): DataFrame =
    referentialAudit(spark, dir).orderBy(col("relation"))

  def oReferential: String =
    """WITH legs AS (
      |  SELECT 'lineitem.l_orderkey -> orders' AS relation,
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
      |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
      |  UNION ALL
      |  SELECT 'orders.o_custkey -> customer',
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |  UNION ALL
      |  SELECT 'customer.c_nationkey -> nation',
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer),
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer
      |     WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
      |  UNION ALL
      |  SELECT 'supplier.s_nationkey -> nation',
      |    (SELECT CAST(count(*) AS BIGINT) FROM supplier),
      |    (SELECT CAST(count(*) AS BIGINT) FROM supplier
      |     WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)))
      |SELECT relation, n_rows, n_orphans, n_orphans = 0 AS ok
      |FROM legs ORDER BY relation""".stripMargin

  // ------------------------------------------------ activity streaks

  /** Per-user consecutive-day activity streaks (gaps-and-islands):
    * distinct active days → island key = epoch-day − row_number (equal
    * inside any consecutive run) → per-island lengths → per-user
    * summary. One user-partitioned window over #active-day rows —
    * already deduped, so cost is bounded by users × days, not events. */
  def streaks(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_day"))
    days
      .withColumn("island", col("epoch_day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  def qStreaks(spark: SparkSession, dir: String): DataFrame =
    streaks(Tables.events(spark, dir)).orderBy(col("user_id"))

  def oStreaks: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |i AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM d),
      |s AS (
      |  SELECT user_id, island, count(*) AS len
      |  FROM i GROUP BY user_id, island)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  CAST(max(len) AS BIGINT) AS longest_streak,
      |  CAST(count(*) AS BIGINT) AS n_streaks
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin
}
