package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Exprs

/** The reference's Gold serving queries (sql/schema.sql:211-311) as
  * DataFrame programs over the Silver stage.
  *
  * Scale notes: latest-per-key is max_by (two-phase hash aggregate —
  * shuffle carries one candidate row per key per map task) rather than the
  * naive window sort; the windowed variant is kept for parity with the
  * DISTINCT ON view and benefits from Spark's WindowGroupLimit pushdown.
  */
object Serving {

  /** v_latest_weather (DISTINCT ON (city) ... ORDER BY timestamp DESC,
    * sql/schema.sql:211-223): newest row per key, deterministic tiebreak. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val cols = df.columns.toIndexedSeq
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), order).as("_last"))
      .select(cols.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** Window-based variant (W1 row_number mapping, SURVEY §2.5). */
  def latestPerKeyWindowed(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("_rn") === 1).drop("_rn")

  /** v_weekly_stats (sql/schema.sql:226-239): weekly rollup of the daily
    * aggregate — avg of daily means, min/max of extremes, summed counts. */
  def weeklyStats(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"), col("year"), col("week_of_year"))
      .agg(
        Exprs.exactAvgWide(col("avg_value")).as("avg_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"),
        sum(col("record_count")).as("record_count"))

  /** v_day_night_comparison (sql/schema.sql:242-252). */
  def dayNight(enriched: DataFrame): DataFrame =
    enriched.groupBy(col("event_type"), to_date(col("ts")).as("date"), col("is_day"))
      .agg(
        Exprs.exactAvg(col("value")).as("avg_value"),
        Exprs.exactAvg(col("k_factor")).as("avg_k"),
        count(lit(1)).as("record_count"))

  /** DAG quality probe: duplicate natural keys (weather_pipeline_dag.py:193-198). */
  def dupScan(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** DAG quality probe: critical-null scan (weather_pipeline_dag.py:205-210). */
  def nullScan(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("total_count"),
      count(when(col("user_id").isNull, lit(1))).as("null_user_count"),
      count(when(col("value").isNull, lit(1))).as("null_value_count"),
      count(when(col("event_type").isNull, lit(1))).as("null_event_type_count"))
      .withColumn("null_pct",
        (col("null_user_count") + col("null_value_count")) * lit(100.0)
          / col("total_count"))

  /** get_database_stats (sql/schema.sql:289-311): UNION ALL of named
    * counts across tables, plus COUNT(DISTINCT) probes. */
  def statsUnion(spark: SparkSession, dir: String): DataFrame = {
    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("value")).select(lit(name).as("metric"), col("value"))
    val ev = Tables.events(spark, dir)
    Seq(
      cnt("events_count", ev),
      cnt("orders_count", Tables.orders(spark, dir)),
      cnt("lineitem_count", Tables.lineitem(spark, dir)),
      cnt("customer_count", Tables.customer(spark, dir)),
      cnt("documents_count", Tables.documents(spark, dir)),
      ev.agg(countDistinct(col("user_id")).as("value"))
        .select(lit("distinct_event_users").as("metric"), col("value")),
      ev.agg(countDistinct(col("event_type")).as("value"))
        .select(lit("distinct_event_types").as("metric"), col("value"))
    ).reduce(_.union(_))
  }

  // ---- query entries -------------------------------------------------

  def qLatestPerUser(spark: SparkSession, dir: String): DataFrame =
    latestPerKey(Silver.clean(Tables.events(spark, dir)),
        Seq("user_id"), struct(col("ts"), col("event_id")))
      .orderBy(col("user_id"))

  def qWeeklyStats(spark: SparkSession, dir: String): DataFrame =
    weeklyStats(Silver.dailyAgg(Silver.cleanEnriched(spark, dir)))
      .orderBy(desc("year"), desc("week_of_year"), col("event_type"))

  def qDayNight(spark: SparkSession, dir: String): DataFrame =
    dayNight(Silver.cleanEnriched(spark, dir))
      .orderBy(desc("date"), col("event_type"), col("is_day"))

  def qDupScan(spark: SparkSession, dir: String): DataFrame =
    dupScan(Tables.events(spark, dir), Seq("user_id", "ts"))
      .orderBy(col("user_id"), col("ts"))

  def qNullScan(spark: SparkSession, dir: String): DataFrame =
    nullScan(Tables.events(spark, dir))

  def qStatsUnion(spark: SparkSession, dir: String): DataFrame =
    statsUnion(spark, dir).orderBy(col("metric"))
}
