package graft

import java.math.RoundingMode
import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.WeatherSilver
import graft.sinks.{GoldSchema, JdbcSink}

/** Gold DDL + decimal-discipline round-trip against embedded Derby:
  * NUMERIC(p,2) coercion parity, CHECK-constraint rejection, the unique
  * replay guard under the idempotent load, and the engine-computed
  * generated period columns (sql/schema.sql:15-78,106,151-153). */
class GoldSchemaSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshUrl() = s"jdbc:derby:memory:gold${System.nanoTime()};create=true"

  /** Paris×2-hours + London fixture; the 20.0/20.07 pair makes the daily
    * avg_temperature carry >2 decimals so rounding is actually exercised. */
  private def fixture: DataFrame = {
    val rows = Seq(
      Row("Paris", "FR", "2024-01-01T12:00:00", 20.0, 19.0, 18.0, 22.0,
        1013: Integer, 65: Integer, 10000: Integer, 5.5, 180: Integer, 20: Integer,
        "Clear", "clear sky", "2024-01-01T07:00:00", "2024-01-01T17:00:00",
        "2024-01-01T12:00:00", 0: Integer, 123L: java.lang.Long, "2024-01-01T12:00:00"),
      Row("Paris", "FR", "2024-01-01T13:00:00", 20.07, 19.1, 18.2, 22.3,
        1012: Integer, 66: Integer, 10000: Integer, 5.7, 175: Integer, 25: Integer,
        "Clear", "clear sky", "2024-01-01T07:00:00", "2024-01-01T17:00:00",
        "2024-01-01T13:00:00", 0: Integer, 124L: java.lang.Long, "2024-01-01T13:00:00"),
      Row("London", "GB", "2024-01-01T12:00:00", 15.0, 14.0, 13.0, 17.0,
        1015: Integer, 70: Integer, 9000: Integer, 4.0, 200: Integer, 40: Integer,
        "Clouds", "scattered clouds", "2024-01-01T07:30:00", "2024-01-01T16:30:00",
        "2024-01-01T12:00:00", 0: Integer, 125L: java.lang.Long, "2024-01-01T12:00:00"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), WeatherSilver.bronzeSchema)
  }

  private def silverTiers: (DataFrame, DataFrame, DataFrame) = {
    val enriched = WeatherSilver.enrich(WeatherSilver.clean(fixture))
    (enriched, WeatherSilver.dailyAgg(enriched), WeatherSilver.hourlyAgg(enriched))
  }

  test("double→DECIMAL cast parity: shortest-repr HALF_UP like float8→NUMERIC") {
    // Postgres assigns float8 to NUMERIC(5,2) by converting the shortest
    // decimal representation then rounding half away from zero; Spark's
    // Cast goes through BigDecimal.valueOf (same shortest repr) with
    // HALF_UP. The literal 12.345 (double ≈ 12.34499999999999957) must
    // round UP to 12.35 under both — an exact-binary-expansion rounder
    // would give 12.34 and break Gold parity.
    val got = Seq(12.345, -12.345, 12.344, 0.005).toDF("v")
      .select(col("v").cast(DecimalType(5, 2)).as("d"))
      .collect().map(_.getDecimal(0).toPlainString).toSeq
    assert(got == Seq("12.35", "-12.35", "12.34", "0.01"), got.toString)
  }

  test("loadAll round-trips all three tiers with NUMERIC scale-2 values") {
    val url = freshUrl()
    val (enriched, daily, hourly) = silverTiers
    val (d, dd, hh) = GoldSchema.loadAll(spark, enriched, daily, hourly, url)
    assert(d == 3 && dd == 2 && hh == 3, s"loaded ($d, $dd, $hh)")

    // Derby reports unquoted identifiers uppercase; normalize for getAs
    def lower(df: DataFrame): DataFrame = df.toDF(df.columns.map(_.toLowerCase): _*)
    val goldDaily = lower(JdbcSink.readTable(spark, url, "gold_weather_daily"))
    val paris = goldDaily.filter(col("city") === "Paris").head()
    // expected = the Spark-computed double, HALF_UP to scale 2 (the same
    // rule the reference's NUMERIC(5,2) assignment applies)
    val expectedAvg = daily.filter(col("city") === "Paris")
      .head().getAs[Double]("avg_temperature")
    val want = java.math.BigDecimal.valueOf(expectedAvg).setScale(2, RoundingMode.HALF_UP)
    val gotAvg = paris.getAs[java.math.BigDecimal]("avg_temperature")
    assert(gotAvg.compareTo(want) == 0, s"avg_temperature $gotAvg != $want")
    assert(gotAvg.scale == 2)
    // generated period columns computed engine-side
    assert(paris.getAs[java.sql.Date]("date").toString == "2024-01-01")
    val goldHourly = lower(JdbcSink.readTable(spark, url, "gold_weather_hourly"))
    val ph13 = goldHourly.filter(col("city") === "Paris" && col("hour") === 13).head()
    assert(ph13.getAs[java.sql.Timestamp]("datetime").toString
      .startsWith("2024-01-01 13:00:00"))
    // detailed tier: temp_range/heat_index decimals present with scale 2
    val det = lower(JdbcSink.readTable(spark, url, "gold_weather_detailed"))
    assert(det.schema("temperature").dataType == DecimalType(5, 2))
    assert(det.schema("wind_speed").dataType == DecimalType(6, 2))
  }

  test("replay: second loadAll loads zero; raw duplicate append is rejected DB-side") {
    val url = freshUrl()
    val (enriched, daily, hourly) = silverTiers
    GoldSchema.loadAll(spark, enriched, daily, hourly, url)
    val second = GoldSchema.loadAll(spark, enriched, daily, hourly, url)
    assert(second == ((0L, 0L, 0L)), s"replay loaded $second")
    // bypassing the anti-join, the unique index is the backstop
    intercept[Exception] {
      JdbcSink.append(GoldSchema.coerceDetailed(enriched), url, "gold_weather_detailed")
    }
    assert(JdbcSink.readTable(spark, url, "gold_weather_detailed").count() == 3)
  }

  test("CHECK constraints reject out-of-domain rows DB-side") {
    val url = freshUrl()
    GoldSchema.ensureTable(url, "gold_weather_detailed", GoldSchema.detailedDdl)
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement(
        """INSERT INTO gold_weather_detailed
          |  (city, country, "timestamp", temperature, humidity, data_quality_score)
          |  VALUES (?, ?, ?, ?, ?, ?)""".stripMargin)
      def tryInsert(temp: Double, hum: Int, score: Int): Option[String] = {
        ps.setString(1, "X"); ps.setString(2, "XX")
        ps.setTimestamp(3, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
        ps.setBigDecimal(4, java.math.BigDecimal.valueOf(temp))
        ps.setInt(5, hum); ps.setInt(6, score)
        try { ps.executeUpdate(); None }
        catch { case e: java.sql.SQLException => Some(e.getMessage) }
      }
      assert(tryInsert(200.0, 50, 90).exists(_.contains("CHK_TEMPERATURE")))
      assert(tryInsert(20.0, 150, 90).exists(_.contains("CHK_HUMIDITY")))
      assert(tryInsert(20.0, 50, 101).exists(_.contains("CHK_QUALITY_SCORE")))
      assert(tryInsert(20.0, 50, 90).isEmpty, "in-domain row must insert")
    } finally c.close()
  }

  test("BI views ship with the schema: latest / weekly / day-night round-trip") {
    val url = freshUrl()
    // add a post-sunset Paris row so day/night actually splits
    val night = Row("Paris", "FR", "2024-01-01T22:00:00", 10.5, 9.0, 8.0, 12.0,
      1010: Integer, 80: Integer, 9500: Integer, 3.2, 190: Integer, 60: Integer,
      "Clear", "clear sky", "2024-01-01T07:00:00", "2024-01-01T17:00:00",
      "2024-01-01T22:00:00", 0: Integer, 126L: java.lang.Long, "2024-01-01T22:00:00")
    val bronze = spark.createDataFrame(
      spark.sparkContext.parallelize(fixture.collect().toSeq :+ night),
      WeatherSilver.bronzeSchema)
    val enriched = WeatherSilver.enrich(WeatherSilver.clean(bronze))
    GoldSchema.loadAll(spark, enriched,
      WeatherSilver.dailyAgg(enriched), WeatherSilver.hourlyAgg(enriched), url)

    def lower(df: DataFrame): DataFrame = df.toDF(df.columns.map(_.toLowerCase): _*)

    // v_latest_weather ≡ DISTINCT ON (city) ORDER BY timestamp DESC
    val latest = lower(JdbcSink.readTable(spark, url, "v_latest_weather"))
    assert(latest.count() == 2, "one row per city")
    val parisLatest = latest.filter(col("city") === "Paris").head()
    assert(parisLatest.getAs[java.sql.Timestamp]("timestamp").toString
      .startsWith("2024-01-01 22:00:00"), "newest Paris row wins")
    assert(parisLatest.getAs[java.math.BigDecimal]("temperature").doubleValue() == 10.5)

    // v_weekly_stats ≡ engine-computed weekly rollup of the coerced daily tier
    val weekly = lower(JdbcSink.readTable(spark, url, "v_weekly_stats"))
    val wantParis = GoldSchema.coerceDaily(WeatherSilver.dailyAgg(enriched))
      .filter(col("city") === "Paris")
      .groupBy("city", "week_of_year")
      .agg(avg(col("avg_temperature").cast("double")).as("avg_temp"),
        sum(col("record_count").cast("long")).as("total_records"))
      .head()
    val gotParis = weekly.filter(col("city") === "Paris").head()
    assert(math.abs(gotParis.getAs[Double]("avg_temp")
      - wantParis.getAs[Double]("avg_temp")) < 1e-9)
    assert(gotParis.getAs[Number]("total_records").longValue()
      == wantParis.getAs[Long]("total_records"))

    // v_day_night_comparison: day rows avg the two midday temps; night is alone
    val dn = lower(JdbcSink.readTable(spark, url, "v_day_night_comparison"))
    val pDay = dn.filter(col("city") === "Paris" && col("is_day") === true).head()
    assert(pDay.getAs[Number]("measurement_count").longValue() == 2)
    assert(math.abs(pDay.getAs[Double]("avg_temperature") - 20.035) < 1e-9,
      s"got ${pDay.getAs[Double]("avg_temperature")}")
    assert(pDay.getAs[java.sql.Date]("date").toString == "2024-01-01")
    val pNight = dn.filter(col("city") === "Paris" && col("is_day") === false).head()
    assert(pNight.getAs[Number]("measurement_count").longValue() == 1)
    assert(pNight.getAs[Double]("avg_temperature") == 10.5)

    GoldSchema.ensureViews(url) // idempotent: second call is a no-op
  }

  test("get_database_stats / cleanup_old_data ship with the schema and run warehouse-side") {
    val url = freshUrl()
    val (enriched, daily, hourly) = silverTiers
    GoldSchema.loadAll(spark, enriched, daily, hourly, url)

    val c = DriverManager.getConnection(url)
    try {
      // the DBA's call: SELECT * FROM TABLE(get_database_stats()) s
      def stats(): Map[String, Long] = {
        val rs = c.createStatement().executeQuery(
          "SELECT * FROM TABLE(get_database_stats()) s")
        val b = Map.newBuilder[String, Long]
        while (rs.next()) b += rs.getString("metric_name") -> rs.getLong("metric_value")
        b.result()
      }
      val s1 = stats()
      assert(s1("total_detailed_records") == 3 && s1("total_daily_aggregates") == 2
        && s1("total_hourly_aggregates") == 3 && s1("distinct_cities") == 2, s1.toString)
      assert(s1.contains("pipeline_executions"), "ledger metric present")

      // CALL cleanup_old_data(n): fixture rows are 2024-dated, so a huge
      // retention keeps everything and retention 1 sweeps everything;
      // per-table deleted counts come back as the dynamic result set
      def cleanup(days: Int): Map[String, Long] = {
        val cs = c.prepareCall("CALL cleanup_old_data(?)")
        cs.setInt(1, days)
        assert(cs.execute(), "procedure must return its result set")
        val rs = cs.getResultSet
        val b = Map.newBuilder[String, Long]
        // positional access: Derby surfaces a procedure's dynamic result
        // set without the query's column aliases
        while (rs.next()) b += rs.getString(1) -> rs.getLong(2)
        b.result()
      }
      val kept = cleanup(365000)
      assert(kept.values.sum == 0, s"huge retention must delete nothing: $kept")
      val swept = cleanup(1)
      assert(swept == Map("gold_weather_detailed" -> 3L, "gold_weather_daily" -> 2L,
        "gold_weather_hourly" -> 3L), swept.toString)
      assert(stats()("total_detailed_records") == 0, "stats see the sweep")

      // idempotent routine creation
      GoldSchema.ensureRoutines(url)
    } finally c.close()
  }

  test("ensureTable is idempotent") {
    val url = freshUrl()
    GoldSchema.ensureTable(url, "gold_weather_daily", GoldSchema.dailyDdl)
    GoldSchema.ensureTable(url, "gold_weather_daily", GoldSchema.dailyDdl) // no throw
  }
}
