package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Exprs

/** Faithful port of the reference's weather Silver stage over the
  * canonical 21-column Bronze schema (silver_processor.py:65-89 declared
  * thrice per SURVEY §1.3). The events-based Silver object exercises the
  * same operator classes against the driver fixtures; this module keeps
  * exact domain parity: ISO-string timestamp casts, temperature bounds,
  * sunrise/sunset daylight, heat index, and the reference's aggregate
  * column sets (silver_processor.py:279-304).
  */
object WeatherSilver {

  /** Bronze schema: WeatherData dataclass + Kafka lineage
    * (weather_producer.py:24-48, kafka_consumer_s3.py:212-217). */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("city", StringType, nullable = false),
    StructField("country", StringType),
    StructField("timestamp", StringType),
    StructField("temperature", DoubleType),
    StructField("feels_like", DoubleType),
    StructField("temp_min", DoubleType),
    StructField("temp_max", DoubleType),
    StructField("pressure", IntegerType),
    StructField("humidity", IntegerType),
    StructField("visibility", IntegerType),
    StructField("wind_speed", DoubleType),
    StructField("wind_deg", IntegerType),
    StructField("clouds", IntegerType),
    StructField("weather_main", StringType),
    StructField("weather_description", StringType),
    StructField("sunrise", StringType),
    StructField("sunset", StringType),
    StructField("ingestion_timestamp", StringType),
    StructField("_kafka_partition", IntegerType),
    StructField("_kafka_offset", LongType),
    StructField("_kafka_timestamp", StringType)))

  /** Raw OpenWeather API payload schema (tests/test_pipeline.py:41-59);
    * parse+flatten mirrors weather_producer.py:93-129. */
  val apiPayloadSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("sys", StructType(Seq(
      StructField("country", StringType),
      StructField("sunrise", LongType), StructField("sunset", LongType)))),
    StructField("dt", LongType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType), StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType), StructField("temp_max", DoubleType),
      StructField("pressure", IntegerType), StructField("humidity", IntegerType)))),
    StructField("visibility", IntegerType),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType), StructField("deg", IntegerType)))),
    StructField("clouds", StructType(Seq(StructField("all", IntegerType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType), StructField("description", StringType)))))))

  /** JSON payload column → flat weather record (S1 parse leg; the HTTP
    * GET itself is a driver-side java.net.http call in deployments). */
  def parseApiPayload(json: Column): Column = {
    val r = from_json(json, apiPayloadSchema)
    struct(
      r.getField("name").as("city"),
      r.getField("sys").getField("country").as("country"),
      to_timestamp(r.getField("dt").cast("timestamp")).as("timestamp"),
      r.getField("main").getField("temp").as("temperature"),
      r.getField("main").getField("feels_like").as("feels_like"),
      r.getField("main").getField("temp_min").as("temp_min"),
      r.getField("main").getField("temp_max").as("temp_max"),
      r.getField("main").getField("pressure").as("pressure"),
      r.getField("main").getField("humidity").as("humidity"),
      r.getField("visibility").as("visibility"),
      r.getField("wind").getField("speed").as("wind_speed"),
      r.getField("wind").getField("deg").as("wind_deg"),
      r.getField("clouds").getField("all").as("clouds"),
      element_at(r.getField("weather"), 1).getField("main").as("weather_main"),
      element_at(r.getField("weather"), 1).getField("description").as("weather_description"),
      r.getField("sys").getField("sunrise").cast("timestamp").as("sunrise"),
      r.getField("sys").getField("sunset").cast("timestamp").as("sunset"))
  }

  val TempMin = -100.0
  val TempMax = 60.0
  private val optionalCols =
    Seq("feels_like", "pressure", "humidity", "visibility", "wind_speed")

  /** clean_data (silver_processor.py:157-201): ISO-string→timestamp ×4,
    * null rejection, temperature bounds, natural-key dedup, quality score
    * + processing metadata. */
  def clean(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("timestamp", to_timestamp(col("timestamp")))
      .withColumn("sunrise", to_timestamp(col("sunrise")))
      .withColumn("sunset", to_timestamp(col("sunset")))
      .withColumn("ingestion_timestamp", to_timestamp(col("ingestion_timestamp")))
      .filter(col("city").isNotNull && col("timestamp").isNotNull
        && col("temperature").isNotNull)
      .filter(col("temperature").between(TempMin, TempMax))
      .dropDuplicates("city", "timestamp")
      .withColumn("processing_timestamp", current_timestamp())
      .withColumn("data_quality_score", Exprs.qualityScore(optionalCols.map(col)))

  /** add_derived_columns (silver_processor.py:222-253). */
  def enrich(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .withColumn("hour", hour(col("timestamp")))
      .withColumn("day_of_week", dayofweek(col("timestamp")))
      .withColumn("week_of_year", weekofyear(col("timestamp")))
      .withColumn("quarter", quarter(col("timestamp")))
      .withColumn("is_weekend", Exprs.isWeekend(col("timestamp")))
      .withColumn("is_day",
        Exprs.isDay(col("timestamp"), col("sunrise"), col("sunset")))
      .withColumn("temp_range", Exprs.tempRange(col("temp_max"), col("temp_min")))
      .withColumn("heat_index", Exprs.heatIndex(col("temperature"), col("humidity")))

  /** create_aggregations daily grain (silver_processor.py:279-290):
    * reference measure set + literal aggregation_level tag. */
  def dailyAgg(df: DataFrame): DataFrame =
    df.groupBy(col("city"), col("country"), col("year"), col("month"), col("day"))
      .agg(
        avg(col("temperature")).as("avg_temperature"),
        min(col("temp_min")).as("min_temperature"),
        max(col("temp_max")).as("max_temperature"),
        avg(col("humidity")).as("avg_humidity"),
        avg(col("wind_speed")).as("avg_wind_speed"),
        avg(col("pressure")).as("avg_pressure"),
        count(lit(1)).as("record_count"),
        max(col("processing_timestamp")).as("last_updated"))
      .withColumn("aggregation_level", lit("daily"))

  /** Hourly grain (silver_processor.py:293-304) + the Gold generated
    * period timestamp make_timestamp(y,m,d,h,0,0) (sql/schema.sql:151-153). */
  def hourlyAgg(df: DataFrame): DataFrame =
    df.groupBy(col("city"), col("country"), col("year"), col("month"),
        col("day"), col("hour"))
      .agg(
        avg(col("temperature")).as("avg_temperature"),
        min(col("temp_min")).as("min_temperature"),
        max(col("temp_max")).as("max_temperature"),
        avg(col("humidity")).as("avg_humidity"),
        avg(col("wind_speed")).as("avg_wind_speed"),
        avg(col("pressure")).as("avg_pressure"),
        count(lit(1)).as("record_count"),
        max(col("processing_timestamp")).as("last_updated"))
      .withColumn("aggregation_level", lit("hourly"))
      .withColumn("period_ts",
        make_timestamp(col("year"), col("month"), col("day"), col("hour"),
          lit(0), lit(0)))

  /** Typed record for the cleaned Silver grain — the Dataset[T] API
    * boundary (SURVEY §1.3: case-class Encoder where type safety helps;
    * column expressions stay the workhorse inside the engine). */
  case class WeatherRecord(
      city: String, country: String, timestamp: java.sql.Timestamp,
      temperature: Double, feels_like: Option[Double],
      temp_min: Option[Double], temp_max: Option[Double],
      pressure: Option[Int], humidity: Option[Int],
      wind_speed: Option[Double], data_quality_score: Int)

  /** Cleaned frame → typed Dataset (compile-time field access for
    * consumers; groupByKey/mapGroups style operations). */
  def toDataset(cleaned: DataFrame): org.apache.spark.sql.Dataset[WeatherRecord] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned.select(col("city"), col("country"), col("timestamp"),
        col("temperature"), col("feels_like"), col("temp_min"),
        col("temp_max"), col("pressure"), col("humidity"),
        col("wind_speed"), col("data_quality_score"))
      .as[WeatherRecord]
  }

  /** Retention filter (F11 interval arithmetic; cleanup_old_data analog
    * for parquet-resident data, sql/schema.sql:259-286). */
  def retentionFilter(df: DataFrame, tsCol: String, keepDays: Int): DataFrame =
    df.filter(col(tsCol) >= date_sub(current_date(), keepDays).cast("timestamp"))
}
