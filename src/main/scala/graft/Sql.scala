package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface: register the fixture tables as temp views and run
  * queries through spark.sql — the same Catalyst plans as the DataFrame
  * API, exposed to SQL-first users (the reference's serving layer is
  * plain SQL views, sql/schema.sql:211-252).
  */
object Sql {

  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }

  /** v_weekly_stats as literal SQL over the registered views (A3 through
    * the SQL parser instead of the DataFrame DSL). Exact-deterministic
    * via the same decimal discipline, so it shares a DuckDB oracle. */
  def qWeeklySql(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(
      """SELECT event_type, year(ts) AS year, weekofyear(ts) AS week_of_year,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(value) AS avg_value,
        |  MIN(value) AS min_value,
        |  MAX(value) AS max_value,
        |  COUNT(*) AS record_count
        |FROM events
        |GROUP BY event_type, year(ts), weekofyear(ts)
        |ORDER BY year DESC, week_of_year DESC, event_type""".stripMargin)
  }

  /** DuckDB twin (dayofweek-free, so only the weekofyear convention
    * matters — ISO weeks in both engines). */
  def oWeeklySql: String =
    """SELECT event_type, CAST(year(ts) AS INTEGER) AS year,
      |  CAST(weekofyear(ts) AS INTEGER) AS week_of_year,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(value) AS avg_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value,
      |  COUNT(*) AS record_count
      |FROM events
      |GROUP BY event_type, year(ts), weekofyear(ts)
      |ORDER BY year DESC, week_of_year DESC, event_type""".stripMargin
}
