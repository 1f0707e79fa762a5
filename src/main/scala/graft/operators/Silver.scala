package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** The Silver stage of the reference pipeline (silver_processor.py:157-306)
  * re-expressed over the `events` fixture stream: type normalization, null
  * rejection, range filtering, key dedup, quality scoring, derived calendar
  * columns, and daily/hourly grouped aggregations.
  *
  * Scale notes (100 TB):
  *  - Dedup uses groupBy + min_by (partial aggregation, map-side combine,
  *    one shuffle on the natural key) instead of a row_number window,
  *    which would need a full sort per key with no partial aggregation.
  *  - All filters are declarative and sit directly over the parquet scan,
  *    so Catalyst pushes them into the reader (PushedFilters) — unlike the
  *    reference's driver-side path pruning (silver_processor.py:134-140).
  *  - Aggregations are plain groupBy → two-phase HashAggregate; group keys
  *    are low-cardinality (event_type × calendar), so the shuffle carries
  *    only partial aggregates, not rows.
  */
object Silver {

  val ValueMin = 0.0
  val ValueMax = 200.0

  /** Deterministic first-row-per-key dedup: min_by(struct(*), order).
    * Semantics of dropDuplicates(keys) (silver_processor.py:191) with a
    * deterministic tiebreak so results are oracle-comparable. */
  def dedupFirstByKey(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val cols = df.columns.toIndexedSeq
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(cols.map(col): _*), order).as("_first"))
      .select(cols.map(c => col(s"_first.$c").as(c)): _*)
  }

  /** Cast → null-reject → range-filter → dedup → quality score
    * (silver_processor.py:157-201). The string→timestamp round trip
    * exercises the reference's ISO-string cast (P1/F1) even though the
    * fixture ts is already a timestamp. */
  def clean(events: DataFrame): DataFrame = {
    events
      .withColumn("ts", to_timestamp(col("ts").cast("string")))
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .filter(col("value").between(ValueMin, ValueMax))
      .transform(dedupFirstByKey(_, Seq("user_id", "ts"), col("event_id")))
      .withColumn("data_quality_score",
        Exprs.qualityScore(Seq(col("event_type"), col("value"), col("props"))))
  }

  /** Derived calendar/context columns (silver_processor.py:222-253):
    * calendar extractors, weekend/daylight flags, and the heat-index
    * analog over the JSON props field (exercises get_json_object). */
  def enrich(df: DataFrame): DataFrame = {
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))
      .withColumn("day_of_week", dayofweek(col("ts")))
      .withColumn("week_of_year", weekofyear(col("ts")))
      .withColumn("quarter", quarter(col("ts")))
      .withColumn("is_weekend", Exprs.isWeekend(col("ts")))
      .withColumn("is_day", Exprs.isDay(hour(col("ts"))))
      .withColumn("k_factor", get_json_object(col("props"), "$.k").cast("double"))
      .withColumn("heat_index", Exprs.heatIndex(col("value"), col("k_factor")))
  }

  def cleanEnriched(spark: SparkSession, dir: String): DataFrame =
    enrich(clean(Tables.events(spark, dir)))

  /** Daily-grain aggregate (silver_processor.py:279-290): one row per
    * (event_type, day) with exact-deterministic measures. */
  def dailyAgg(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"), col("year"), col("month"), col("day"))
      .agg(
        Exprs.exactAvg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(Exprs.dec2(col("value"))).cast("double").as("sum_value"),
        count(lit(1)).as("record_count"),
        countDistinct(col("user_id")).as("distinct_users"),
        max(col("ts")).as("last_seen"))
      .withColumn("week_of_year",
        weekofyear(make_date(col("year"), col("month"), col("day"))))

  /** Hourly-grain aggregate (silver_processor.py:293-304). */
  def hourlyAgg(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"), col("year"), col("month"), col("day"), col("hour"))
      .agg(
        Exprs.exactAvg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("record_count"),
        countDistinct(col("user_id")).as("distinct_users"))

  // ---- query entries -------------------------------------------------

  def qClean(spark: SparkSession, dir: String): DataFrame =
    clean(Tables.events(spark, dir)).orderBy(col("event_id"))

  def qEnrich(spark: SparkSession, dir: String): DataFrame =
    cleanEnriched(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value",
        "data_quality_score", "year", "month", "day", "hour", "day_of_week",
        "week_of_year", "quarter", "is_weekend", "is_day", "k_factor",
        "heat_index")
      .orderBy(col("event_id"))

  def qDailyAgg(spark: SparkSession, dir: String): DataFrame =
    dailyAgg(cleanEnriched(spark, dir))
      .orderBy(col("event_type"), col("year"), col("month"), col("day"))

  def qHourlyAgg(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(cleanEnriched(spark, dir))
      .orderBy(col("event_type"), col("year"), col("month"), col("day"), col("hour"))
}
