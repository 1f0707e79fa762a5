package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer DDL + decimal discipline (sql/schema.sql re-expressed).
  *
  * The reference declares its Gold measures as NUMERIC(5,2)/(6,2)/(7,2)
  * with CHECK constraints and generated period columns
  * (/root/reference/sql/schema.sql:15-78 detailed, :95-131 daily + the
  * `date` GENERATED ALWAYS AS make_date(year,month,day) at :106, :140-170
  * hourly + make_timestamp at :151-153). Parity here is split by layer:
  *
  *  - Decimal coercion happens IN THE ENGINE: measures are cast to
  *    DecimalType before the JDBC write, so the rounding rule is Spark's
  *    (BigDecimal HALF_UP — ties away from zero), which is the same rule
  *    Postgres applies when assigning a float to NUMERIC(p,s). The target
  *    DB then stores an already-exact decimal and no DB-specific
  *    float→decimal behavior can leak into Gold.
  *  - CHECK constraints and the natural-key unique index live in the DDL,
  *    enforced DB-side exactly like the reference (the unique index is
  *    the reference's replay guard; ours is belt-and-braces on top of the
  *    anti-join in [[JdbcSink.idempotentAppend]]).
  *  - Generated period columns (`date`, `datetime`) are computed by the
  *    engine with make_date/make_timestamp at load: Derby's generation
  *    clause cannot call date constructors, and at 100 TB you want that
  *    trivial projection on 1000 executors, not in the single-writer DB.
  */
object GoldSchema {

  /** gold_weather_detailed (schema.sql:15-78): NUMERIC measures + the
    * reference's three CHECK constraints + unique replay guard. */
  val detailedDdl: String =
    """CREATE TABLE gold_weather_detailed (
      |  city VARCHAR(100) NOT NULL,
      |  country VARCHAR(10) NOT NULL,
      |  "timestamp" TIMESTAMP NOT NULL,
      |  temperature DECIMAL(5,2),
      |  feels_like DECIMAL(5,2),
      |  temp_min DECIMAL(5,2),
      |  temp_max DECIMAL(5,2),
      |  temp_range DECIMAL(5,2),
      |  pressure INTEGER,
      |  humidity INTEGER,
      |  wind_speed DECIMAL(6,2),
      |  weather_main VARCHAR(50),
      |  weather_description VARCHAR(100),
      |  is_day BOOLEAN,
      |  heat_index DECIMAL(5,2),
      |  data_quality_score INTEGER,
      |  CONSTRAINT chk_temperature CHECK (temperature BETWEEN -100 AND 60),
      |  CONSTRAINT chk_humidity CHECK (humidity BETWEEN 0 AND 100),
      |  CONSTRAINT chk_quality_score CHECK (data_quality_score BETWEEN 0 AND 100),
      |  CONSTRAINT uq_weather_detailed UNIQUE (city, "timestamp")
      |)""".stripMargin

  /** gold_weather_daily_aggregates (schema.sql:95-131); `date` is the
    * engine-computed analog of the GENERATED make_date column. */
  val dailyDdl: String =
    """CREATE TABLE gold_weather_daily (
      |  city VARCHAR(100) NOT NULL,
      |  country VARCHAR(10) NOT NULL,
      |  "year" INTEGER NOT NULL,
      |  "month" INTEGER NOT NULL,
      |  "day" INTEGER NOT NULL,
      |  "date" DATE NOT NULL,
      |  week_of_year INTEGER NOT NULL,
      |  avg_temperature DECIMAL(5,2),
      |  min_temperature DECIMAL(5,2),
      |  max_temperature DECIMAL(5,2),
      |  avg_humidity DECIMAL(5,2),
      |  avg_wind_speed DECIMAL(6,2),
      |  avg_pressure DECIMAL(7,2),
      |  record_count INTEGER NOT NULL,
      |  aggregation_level VARCHAR(20) DEFAULT 'daily',
      |  last_updated TIMESTAMP NOT NULL,
      |  CONSTRAINT uq_daily_agg UNIQUE (city, "year", "month", "day")
      |)""".stripMargin

  /** gold_weather_hourly_aggregates (schema.sql:140-170); `datetime` is
    * the engine-computed analog of the GENERATED make_timestamp column. */
  val hourlyDdl: String =
    """CREATE TABLE gold_weather_hourly (
      |  city VARCHAR(100) NOT NULL,
      |  country VARCHAR(10) NOT NULL,
      |  "year" INTEGER NOT NULL,
      |  "month" INTEGER NOT NULL,
      |  "day" INTEGER NOT NULL,
      |  "hour" INTEGER NOT NULL,
      |  "datetime" TIMESTAMP NOT NULL,
      |  avg_temperature DECIMAL(5,2),
      |  min_temperature DECIMAL(5,2),
      |  max_temperature DECIMAL(5,2),
      |  avg_humidity DECIMAL(5,2),
      |  avg_wind_speed DECIMAL(6,2),
      |  avg_pressure DECIMAL(7,2),
      |  record_count INTEGER NOT NULL,
      |  aggregation_level VARCHAR(20) DEFAULT 'hourly',
      |  last_updated TIMESTAMP NOT NULL,
      |  CONSTRAINT uq_hourly_agg UNIQUE (city, "year", "month", "day", "hour")
      |)""".stripMargin

  /** BI views (sql/schema.sql:211-252 re-expressed in ANSI/Derby SQL):
    * the reference persists three Postgres views so BI tools query curated
    * relations rather than raw Gold tables. Derby deltas, each deliberate:
    *  - `DISTINCT ON (city) ... ORDER BY timestamp DESC` → correlated
    *    MAX("timestamp"); the unique (city, timestamp) key makes both
    *    forms pick the same single row per city.
    *  - view-level ORDER BY is Postgres leniency, not ANSI — dropped
    *    (BI tools order at query time; our oracle-gated query twins pin
    *    deterministic orderings engine-side).
    *  - Derby's AVG over DECIMAL(5,2) keeps scale 2 (truncating), unlike
    *    Postgres's widening numeric AVG — measures are cast to DOUBLE
    *    before averaging so the views carry full-precision means. */
  val latestViewDdl: String =
    """CREATE VIEW v_latest_weather AS
      |SELECT city, country, "timestamp", temperature, feels_like, humidity,
      |       wind_speed, weather_main, weather_description
      |FROM gold_weather_detailed t
      |WHERE "timestamp" = (SELECT MAX(u."timestamp")
      |                     FROM gold_weather_detailed u WHERE u.city = t.city)""".stripMargin

  val weeklyViewDdl: String =
    """CREATE VIEW v_weekly_stats AS
      |SELECT city, country, "year", week_of_year,
      |       AVG(CAST(avg_temperature AS DOUBLE)) AS avg_temp,
      |       MIN(min_temperature) AS min_temp,
      |       MAX(max_temperature) AS max_temp,
      |       AVG(CAST(avg_humidity AS DOUBLE)) AS avg_humidity,
      |       SUM(record_count) AS total_records
      |FROM gold_weather_daily
      |GROUP BY city, country, "year", week_of_year""".stripMargin

  val dayNightViewDdl: String =
    """CREATE VIEW v_day_night_comparison AS
      |SELECT city, DATE("timestamp") AS "date", is_day,
      |       AVG(CAST(temperature AS DOUBLE)) AS avg_temperature,
      |       AVG(CAST(humidity AS DOUBLE)) AS avg_humidity,
      |       COUNT(*) AS measurement_count
      |FROM gold_weather_detailed
      |GROUP BY city, DATE("timestamp"), is_day""".stripMargin

  private val viewDdls: Seq[(String, String)] = Seq(
    "V_LATEST_WEATHER" -> latestViewDdl,
    "V_WEEKLY_STATS" -> weeklyViewDdl,
    "V_DAY_NIGHT_COMPARISON" -> dayNightViewDdl)

  /** Create the BI views if absent (Derby has no CREATE OR REPLACE). */
  def ensureViews(url: String): Unit = {
    val c = DriverManager.getConnection(url)
    try viewDdls.foreach { case (name, ddl) =>
      val meta = c.getMetaData.getTables(null, null, name, Array("VIEW"))
      if (!meta.next()) c.createStatement().executeUpdate(ddl)
    } finally c.close()
  }

  /** The reference's two plpgsql utility routines
    * (sql/schema.sql:259-311) re-expressed as Derby routines backed by
    * the static entry points below, shipped with the schema so a DBA on
    * the warehouse can call them without the engine:
    *
    *  - Postgres `SELECT * FROM get_database_stats()` ↔ Derby
    *    `SELECT * FROM TABLE(get_database_stats()) s` (Derby table
    *    functions need the TABLE() wrapper);
    *  - Postgres `SELECT * FROM cleanup_old_data(30)` ↔ Derby
    *    `CALL cleanup_old_data(30)` — same (table_name, deleted_count)
    *    rows, returned as the procedure's dynamic result set. Derby has
    *    no parameter defaults, so the reference's DEFAULT 30 is the
    *    caller's job. */
  val statsFunctionDdl: String =
    """CREATE FUNCTION get_database_stats()
      |RETURNS TABLE (metric_name VARCHAR(64), metric_value BIGINT)
      |LANGUAGE JAVA PARAMETER STYLE DERBY_JDBC_RESULT_SET READS SQL DATA
      |EXTERNAL NAME 'graft.sinks.GoldSchema.databaseStats'""".stripMargin

  val cleanupProcedureDdl: String =
    """CREATE PROCEDURE cleanup_old_data(IN retention_days INTEGER)
      |LANGUAGE JAVA PARAMETER STYLE JAVA MODIFIES SQL DATA DYNAMIC RESULT SETS 1
      |EXTERNAL NAME 'graft.sinks.GoldSchema.cleanupOldData'""".stripMargin

  /** Table-function body (get_database_stats, schema.sql:289-311): runs
    * on the calling session's nested connection. Invoked BY DERBY —
    * engine code never calls this directly. */
  def databaseStats(): java.sql.ResultSet = {
    val c = DriverManager.getConnection("jdbc:default:connection")
    c.createStatement().executeQuery(
      """SELECT CAST('total_detailed_records' AS VARCHAR(64)) AS metric_name,
        |       CAST(COUNT(*) AS BIGINT) AS metric_value FROM gold_weather_detailed
        |UNION ALL SELECT CAST('total_daily_aggregates' AS VARCHAR(64)),
        |       CAST(COUNT(*) AS BIGINT) FROM gold_weather_daily
        |UNION ALL SELECT CAST('total_hourly_aggregates' AS VARCHAR(64)),
        |       CAST(COUNT(*) AS BIGINT) FROM gold_weather_hourly
        |UNION ALL SELECT CAST('distinct_cities' AS VARCHAR(64)),
        |       CAST(COUNT(DISTINCT city) AS BIGINT) FROM gold_weather_detailed
        |UNION ALL SELECT CAST('pipeline_executions' AS VARCHAR(64)),
        |       CAST(COUNT(*) AS BIGINT) FROM pipeline_execution_log""".stripMargin)
  }

  /** Procedure body (cleanup_old_data, schema.sql:259-286): DB-side
    * retention deletes on all three gold tiers, per-table deleted counts
    * returned as the dynamic result set. Invoked BY DERBY via CALL. */
  def cleanupOldData(retentionDays: Int, rs: Array[java.sql.ResultSet]): Unit = {
    val c = DriverManager.getConnection("jdbc:default:connection")
    def del(sql: String): Int = {
      val st = c.createStatement()
      try st.executeUpdate(sql) finally st.close()
    }
    val cutTs = s"{fn TIMESTAMPADD(SQL_TSI_DAY, -$retentionDays, CURRENT_TIMESTAMP)}"
    val d = del(s"""DELETE FROM gold_weather_detailed WHERE "timestamp" < $cutTs""")
    val dd = del(s"""DELETE FROM gold_weather_daily WHERE "date" < CAST($cutTs AS DATE)""")
    val hh = del(s"""DELETE FROM gold_weather_hourly WHERE "datetime" < $cutTs""")
    rs(0) = c.createStatement().executeQuery(
      s"""SELECT CAST('gold_weather_detailed' AS VARCHAR(64)) AS table_name,
         |       CAST($d AS BIGINT) AS deleted_count FROM SYSIBM.SYSDUMMY1
         |UNION ALL SELECT CAST('gold_weather_daily' AS VARCHAR(64)),
         |       CAST($dd AS BIGINT) FROM SYSIBM.SYSDUMMY1
         |UNION ALL SELECT CAST('gold_weather_hourly' AS VARCHAR(64)),
         |       CAST($hh AS BIGINT) FROM SYSIBM.SYSDUMMY1""".stripMargin)
  }

  /** Create the utility routines if absent. The stats function reads
    * pipeline_execution_log, so the ledger table is ensured first —
    * schema.sql ships them together. */
  def ensureRoutines(url: String): Unit = {
    new JdbcSink.PipelineLog(url).ensureTable()
    val c = DriverManager.getConnection(url)
    try {
      val haveFn = c.getMetaData.getFunctions(null, null, "GET_DATABASE_STATS").next()
      if (!haveFn) {
        val st = c.createStatement()
        try st.executeUpdate(statsFunctionDdl) finally st.close()
      }
      val haveProc = c.getMetaData.getProcedures(null, null, "CLEANUP_OLD_DATA").next()
      if (!haveProc) {
        val st = c.createStatement()
        try st.executeUpdate(cleanupProcedureDdl) finally st.close()
      }
    } finally c.close()
  }

  private def dec(c: String, p: Int, s: Int): Column =
    col(c).cast(DecimalType(p, s)).as(c)

  /** Reference measure precisions (schema.sql:106-113 / :155-160). */
  private val aggMeasures: Seq[Column] = Seq(
    dec("avg_temperature", 5, 2), dec("min_temperature", 5, 2),
    dec("max_temperature", 5, 2), dec("avg_humidity", 5, 2),
    dec("avg_wind_speed", 6, 2), dec("avg_pressure", 7, 2))

  /** [[graft.operators.WeatherSilver.dailyAgg]] output → Gold daily shape:
    * NUMERIC coercion + the generated `date` column. */
  def coerceDaily(daily: DataFrame): DataFrame =
    daily.select(Seq(col("city"), col("country"), col("year"), col("month"),
      col("day"), make_date(col("year"), col("month"), col("day")).as("date"),
      weekofyear(make_date(col("year"), col("month"), col("day"))).as("week_of_year"))
      ++ aggMeasures
      ++ Seq(col("record_count").cast("int").as("record_count"),
        col("aggregation_level"), col("last_updated")): _*)

  /** Hourly analog with the generated `datetime` period column. */
  def coerceHourly(hourly: DataFrame): DataFrame =
    hourly.select(Seq(col("city"), col("country"), col("year"), col("month"),
      col("day"), col("hour"),
      make_timestamp(col("year"), col("month"), col("day"), col("hour"),
        lit(0), lit(0)).as("datetime"))
      ++ aggMeasures
      ++ Seq(col("record_count").cast("int").as("record_count"),
        col("aggregation_level"), col("last_updated")): _*)

  /** Enriched detail frame → Gold detailed shape (schema.sql:15-78). */
  def coerceDetailed(enriched: DataFrame): DataFrame =
    enriched.select(col("city"), col("country"), col("timestamp"),
      dec("temperature", 5, 2), dec("feels_like", 5, 2),
      dec("temp_min", 5, 2), dec("temp_max", 5, 2), dec("temp_range", 5, 2),
      col("pressure"), col("humidity"), dec("wind_speed", 6, 2),
      col("weather_main"), col("weather_description"), col("is_day"),
      dec("heat_index", 5, 2), col("data_quality_score"))

  /** Create a Gold table if absent (Derby/ANSI DDL above). */
  def ensureTable(url: String, table: String, ddl: String): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val meta = c.getMetaData.getTables(null, null, table.toUpperCase, null)
      if (!meta.next()) c.createStatement().executeUpdate(ddl)
    } finally c.close()
  }

  /** Full Gold load (gold_loader.py:171-330 collapsed): ensure the three
    * reference tables, coerce each Silver frame to its NUMERIC shape, and
    * idempotent-append on the natural keys. Returns rows loaded per tier
    * (detailed, daily, hourly). The unique indexes in the DDL remain the
    * DB-side replay guard underneath the engine-side anti-join. */
  def loadAll(spark: org.apache.spark.sql.SparkSession, enriched: DataFrame,
      daily: DataFrame, hourly: DataFrame, url: String): (Long, Long, Long) = {
    ensureTable(url, "gold_weather_detailed", detailedDdl)
    ensureTable(url, "gold_weather_daily", dailyDdl)
    ensureTable(url, "gold_weather_hourly", hourlyDdl)
    ensureViews(url) // schema.sql ships views alongside the tables
    ensureRoutines(url) // ... and the stats/cleanup utility routines
    val d = JdbcSink.idempotentAppend(spark, coerceDetailed(enriched), url,
      "gold_weather_detailed", Seq("city", "timestamp"))
    val dd = JdbcSink.idempotentAppend(spark, coerceDaily(daily), url,
      "gold_weather_daily", Seq("city", "year", "month", "day"))
    val hh = JdbcSink.idempotentAppend(spark, coerceHourly(hourly), url,
      "gold_weather_hourly", Seq("city", "year", "month", "day", "hour"))
    (d, dd, hh)
  }
}
