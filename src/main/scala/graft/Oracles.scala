package graft

/** DuckDB oracle SQL twins for SparkEntry.queries.
  *
  * Conventions (see .claude/skills/verify/SKILL.md):
  *  - output column names identical to the Spark result;
  *  - DuckDB dayofweek is Sun=0 vs Spark Sun=1 → +1 / IN (0,6);
  *  - SUM over ints → CAST(... AS BIGINT) (DuckDB returns HUGEINT);
  *  - float aggregates via exact decimal sums, then double division,
  *    mirroring graft.functions.Exprs.{exactAvg,exactAvgWide,dec2}.
  */
object Oracles {

  /** Cleaned events: null-reject, range filter, first-by-event_id dedup,
    * quality score (Silver.clean twin). */
  val cleanedCte: String =
    """cleaned AS (
      |  SELECT event_id, ts, user_id, event_type, value, props,
      |         100 - CASE WHEN event_type IS NULL THEN 10 ELSE 0 END
      |             - CASE WHEN value IS NULL THEN 10 ELSE 0 END
      |             - CASE WHEN props IS NULL THEN 10 ELSE 0 END AS data_quality_score
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
      |    FROM events
      |    WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      |      AND value BETWEEN 0.0 AND 200.0
      |  ) WHERE rn = 1
      |)""".stripMargin

  /** Derived columns (Silver.enrich twin). */
  val enrichedCte: String =
    """enriched AS (
      |  SELECT *,
      |    CAST(year(ts) AS INTEGER) AS year,
      |    CAST(month(ts) AS INTEGER) AS month,
      |    CAST(day(ts) AS INTEGER) AS day,
      |    CAST(hour(ts) AS INTEGER) AS hour,
      |    CAST(dayofweek(ts) + 1 AS INTEGER) AS day_of_week,
      |    CAST(weekofyear(ts) AS INTEGER) AS week_of_year,
      |    CAST(quarter(ts) AS INTEGER) AS quarter,
      |    dayofweek(ts) IN (0, 6) AS is_weekend,
      |    hour(ts) BETWEEN 7 AND 18 AS is_day,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_factor,
      |    value + 0.5555 * (CAST(json_extract_string(props, '$.k') AS DOUBLE) / 100.0 - 1.0) AS heat_index
      |  FROM cleaned
      |)""".stripMargin

  val dailyAggSelect: String =
    """SELECT event_type, year, month, day,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(value) AS avg_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS record_count,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
      |  MAX(ts) AS last_seen,
      |  CAST(weekofyear(make_date(year, month, day)) AS INTEGER) AS week_of_year
      |FROM enriched
      |GROUP BY event_type, year, month, day""".stripMargin

  val silverClean: String =
    s"""WITH $cleanedCte
       |SELECT event_id, ts, user_id, event_type, value, props, data_quality_score
       |FROM cleaned ORDER BY event_id""".stripMargin

  val silverEnrich: String =
    s"""WITH $cleanedCte, $enrichedCte
       |SELECT event_id, ts, user_id, event_type, value, data_quality_score,
       |       year, month, day, hour, day_of_week, week_of_year, quarter,
       |       is_weekend, is_day, k_factor, heat_index
       |FROM enriched ORDER BY event_id""".stripMargin

  val silverDailyAgg: String =
    s"""WITH $cleanedCte, $enrichedCte
       |$dailyAggSelect
       |ORDER BY event_type, year, month, day""".stripMargin

  val silverHourlyAgg: String =
    s"""WITH $cleanedCte, $enrichedCte
       |SELECT event_type, year, month, day, hour,
       |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(value) AS avg_value,
       |  MIN(value) AS min_value,
       |  MAX(value) AS max_value,
       |  COUNT(*) AS record_count,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
       |FROM enriched
       |GROUP BY event_type, year, month, day, hour
       |ORDER BY event_type, year, month, day, hour""".stripMargin

  val servingLatestPerUser: String =
    s"""WITH $cleanedCte
       |SELECT event_id, ts, user_id, event_type, value, props, data_quality_score
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn2
       |  FROM cleaned
       |) WHERE rn2 = 1 ORDER BY user_id""".stripMargin

  val servingWeekly: String =
    s"""WITH $cleanedCte, $enrichedCte, daily AS ($dailyAggSelect)
       |SELECT event_type, year, week_of_year,
       |  CAST(SUM(CAST(avg_value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(avg_value) AS avg_value,
       |  MIN(min_value) AS min_value,
       |  MAX(max_value) AS max_value,
       |  CAST(SUM(record_count) AS BIGINT) AS record_count
       |FROM daily
       |GROUP BY event_type, year, week_of_year
       |ORDER BY year DESC, week_of_year DESC, event_type""".stripMargin

  val servingDayNight: String =
    s"""WITH $cleanedCte, $enrichedCte
       |SELECT event_type, CAST(ts AS DATE) AS date, is_day,
       |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(value) AS avg_value,
       |  CAST(SUM(CAST(k_factor AS DECIMAL(14,2))) AS DOUBLE) / COUNT(k_factor) AS avg_k,
       |  COUNT(*) AS record_count
       |FROM enriched
       |GROUP BY event_type, CAST(ts AS DATE), is_day
       |ORDER BY date DESC, event_type, is_day""".stripMargin

  val qualityDupScan: String =
    """SELECT user_id, ts, COUNT(*) AS dup_count
      |FROM events GROUP BY user_id, ts HAVING COUNT(*) > 1
      |ORDER BY user_id, ts""".stripMargin

  val qualityNullScan: String =
    """SELECT COUNT(*) AS total_count,
      |  COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_count,
      |  COUNT(CASE WHEN value IS NULL THEN 1 END) AS null_value_count,
      |  COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS null_event_type_count,
      |  (COUNT(CASE WHEN user_id IS NULL THEN 1 END)
      |   + COUNT(CASE WHEN value IS NULL THEN 1 END)) * 100.0 / COUNT(*) AS null_pct
      |FROM events""".stripMargin

  /** Gap-based sessionization twin (StreamingOps.sessionizeBatch, 30-min
    * gap). epoch() yields double seconds in both engines from identical
    * microsecond timestamps, so the gap comparison is bit-identical. */
  val sessionizeBatch: String =
    """WITH m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS ns
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |  SELECT user_id, ts,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |       CAST(COUNT(*) AS INTEGER) AS events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  val statsUnion: String =
    """SELECT 'events_count' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM events
      |UNION ALL SELECT 'orders_count', CAST(COUNT(*) AS BIGINT) FROM orders
      |UNION ALL SELECT 'lineitem_count', CAST(COUNT(*) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'customer_count', CAST(COUNT(*) AS BIGINT) FROM customer
      |UNION ALL SELECT 'documents_count', CAST(COUNT(*) AS BIGINT) FROM documents
      |UNION ALL SELECT 'distinct_event_users', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
      |UNION ALL SELECT 'distinct_event_types', CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events
      |ORDER BY metric""".stripMargin
}
