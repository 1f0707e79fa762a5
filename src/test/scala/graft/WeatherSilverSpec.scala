package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.WeatherSilver

/** Domain-parity spec for the weather Silver stage, built on the
  * reference's own pytest fixtures (tests/test_pipeline.py:163-233 and
  * the mocked API payload :41-59). */
class WeatherSilverSpec extends SparkSpecBase {
  import spark.implicits._

  /** The Paris/London fixture rows (FIXTURES.md A.1). */
  private def fixture: DataFrame = {
    val rows = Seq(
      Row("Paris", "FR", "2024-01-01T12:00:00", 20.0, 19.0, 18.0, 22.0,
        1013: Integer, 65: Integer, 10000: Integer, 5.5, 180: Integer, 20: Integer,
        "Clear", "clear sky", "2024-01-01T07:00:00", "2024-01-01T17:00:00",
        "2024-01-01T12:00:00", 0: Integer, 123L: java.lang.Long, "2024-01-01T12:00:00"),
      Row("London", "GB", "2024-01-01T12:00:00", 15.0, 14.0, 13.0, 17.0,
        1015: Integer, 70: Integer, 9000: Integer, 4.0, 200: Integer, 40: Integer,
        "Clouds", "scattered clouds", "2024-01-01T07:30:00", "2024-01-01T16:30:00",
        "2024-01-01T12:00:00", 0: Integer, 124L: java.lang.Long, "2024-01-01T12:00:00"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), WeatherSilver.bronzeSchema)
  }

  test("clean casts ISO strings to timestamps and keeps valid rows") {
    val cleaned = WeatherSilver.clean(fixture)
    assert(cleaned.count() == 2)
    assert(cleaned.schema("timestamp").dataType.typeName == "timestamp")
    assert(cleaned.schema("sunrise").dataType.typeName == "timestamp")
    // all five optional cols present → score 100
    assert(cleaned.select("data_quality_score").collect().forall(_.getInt(0) == 100))
  }

  test("dedup keeps one row per (city, timestamp) (test_pipeline.py:225-233)") {
    val withDup = fixture.union(fixture.limit(1))
    assert(WeatherSilver.clean(withDup).count() == 2)
  }

  test("range filter drops 70°C, keeps −50°C (test_pipeline.py:297-309)") {
    val extremes = fixture
      .union(fixture.limit(1)
        .withColumn("temperature", lit(70.0))
        .withColumn("timestamp", lit("2024-01-01T13:00:00")))
      .union(fixture.limit(1)
        .withColumn("temperature", lit(-50.0))
        .withColumn("timestamp", lit("2024-01-01T14:00:00")))
    val temps = WeatherSilver.clean(extremes)
      .select("temperature").collect().map(_.getDouble(0)).toSet
    assert(temps == Set(20.0, 15.0, -50.0))
  }

  test("enrich derives the reference's 11 columns with correct values") {
    val e = WeatherSilver.enrich(WeatherSilver.clean(fixture))
      .filter($"city" === "Paris").head()
    def f[T](n: String): T = e.getAs[T](n)
    assert(f[Int]("year") == 2024 && f[Int]("month") == 1 && f[Int]("day") == 1)
    assert(f[Int]("hour") == 12)
    assert(f[Int]("day_of_week") == 2)        // Monday, Sun=1 convention
    assert(f[Int]("week_of_year") == 1 && f[Int]("quarter") == 1)
    assert(!f[Boolean]("is_weekend"))
    assert(f[Boolean]("is_day"))              // noon between 07:00 and 17:00
    assert(f[Double]("temp_range") == 4.0)
    assert(math.abs(f[Double]("heat_index") - (20.0 + 0.5555 * (0.65 - 1.0))) < 1e-9)
  }

  test("daily and hourly aggregates carry the reference measure set") {
    val enriched = WeatherSilver.enrich(WeatherSilver.clean(fixture))
    val daily = WeatherSilver.dailyAgg(enriched)
    assert(daily.count() == 2) // one per city-day
    val paris = daily.filter($"city" === "Paris").head()
    assert(paris.getAs[Double]("avg_temperature") == 20.0)
    assert(paris.getAs[Double]("min_temperature") == 18.0)
    assert(paris.getAs[Double]("max_temperature") == 22.0)
    assert(paris.getAs[Long]("record_count") == 1L)
    assert(paris.getAs[String]("aggregation_level") == "daily")
    val hourly = WeatherSilver.hourlyAgg(enriched)
    val ph = hourly.filter($"city" === "Paris").head()
    assert(ph.getAs[java.sql.Timestamp]("period_ts").toString.startsWith("2024-01-01 12:00:00"))
  }

  test("API payload parse flattens the nested OpenWeather JSON (test_pipeline.py:78-103)") {
    val payload =
      """{"name": "Paris",
        | "sys": {"country": "FR", "sunrise": 1234567890, "sunset": 1234567900},
        | "dt": 1234567890,
        | "main": {"temp": 20.5, "feels_like": 19.0, "temp_min": 18.0, "temp_max": 22.0,
        |          "pressure": 1013, "humidity": 65},
        | "visibility": 10000,
        | "wind": {"speed": 5.5, "deg": 180},
        | "clouds": {"all": 20},
        | "weather": [{"main": "Clear", "description": "clear sky"}]}""".stripMargin
    val parsed = Seq(payload).toDF("value")
      .select(WeatherSilver.parseApiPayload($"value").as("r")).select("r.*")
    val row = parsed.head()
    assert(row.getAs[String]("city") == "Paris")
    assert(row.getAs[String]("country") == "FR")
    assert(row.getAs[Double]("temperature") == 20.5)
    assert(row.getAs[Int]("pressure") == 1013)
    assert(row.getAs[String]("weather_main") == "Clear")
    assert(row.getAs[java.sql.Timestamp]("timestamp").getTime == 1234567890000L)
  }

  test("retention filter keeps only recent rows (F11 interval arithmetic)") {
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val old = java.sql.Timestamp.from(java.time.Instant.now().minusSeconds(86400L * 40))
    val df = Seq((1, now), (2, old)).toDF("id", "ts")
    val kept = WeatherSilver.retentionFilter(df, "ts", 30).select("id")
      .collect().map(_.getInt(0)).toSeq
    assert(kept == Seq(1))
  }
}
