package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One-sided CUSUM change-point detection over the hourly event-rate
  * series — the sequential drift detector that catches a sustained small
  * level shift long before any single point trips a z-score gate
  * (complements [[Temporal.qRollingAnomalies]], which is point-wise).
  *
  * Recurrence, in EXACT integers (cross-multiplied by 10n so the mean
  * and the 10% slack never become floats):
  * {{{ D_t = max(0, D_{t-1} + 10·n·x_t − 11·Σx),  alarm: D_t > 50·Σx }}}
  * i.e. accumulate hourly excess over 1.1× the series mean and alarm
  * once the accumulated excess reaches 5 mean-hours. Integer max/add is
  * order-FIXED by the recurrence itself, so both engines produce
  * bit-identical BIGINTs; the twin replays the same recurrence as a
  * recursive CTE. Exact while 10·n·x_t < 2⁶³ — calendar-bounded n
  * (87.6k hours/decade) leaves headroom past 10⁷ events/hour.
  *
  * Scale shape (100 TB): the heavy input collapses to per-(type, hour)
  * counts via partial aggregation BEFORE anything sequential happens;
  * the fold's state is bounded by CALENDAR HOURS × #types, not corpus
  * size (the [[Moments]] boundedness argument, applied to a recurrence
  * that is inherently sequential per series — parallelizing across
  * series is the only parallelism a CUSUM admits). The dense grid
  * explode is a broadcast of ≤ #hours rows. */
object Cusum {

  /** Dense per-(event_type, hour) counts with CUSUM state and alarms. */
  def hourlyCusum(events: DataFrame): DataFrame = {
    val hours = events.select(col("event_type"),
      date_trunc("hour", col("ts")).as("h"))
    val bounds = hours.agg(min(col("h")).as("h0"), max(col("h")).as("hn"))
    val grid = bounds.select(explode(
      sequence(col("h0"), col("hn"), expr("INTERVAL 1 HOUR"))).as("h"))
    val counts = hours.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
    val dense = counts.select(col("event_type")).distinct()
      .crossJoin(broadcast(grid))
      .join(counts, Seq("event_type", "h"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val stats = dense.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val folded = dense.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"), col("n"), col("sx"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("seq"))
      .withColumn("cus", expr(
        """aggregate(seq, CAST(array() AS ARRAY<BIGINT>),
          |  (acc, e) -> array_append(acc,
          |    greatest(0L, coalesce(try_element_at(acc, -1), 0L)
          |      + 10 * n * e.x - 11 * sx)))""".stripMargin))
    folded
      .select(col("event_type"), col("sx"),
        explode(arrays_zip(col("seq"), col("cus"))).as("z"))
      .select(col("event_type"), col("z.seq.h").as("h"),
        col("z.seq.x").as("n_events"), col("z.cus").as("cusum_d"),
        (col("z.cus") > lit(50) * col("sx")).as("alarm"))
  }

  def qHourlyCusum(spark: SparkSession, dir: String): DataFrame =
    hourlyCusum(Tables.events(spark, dir)).orderBy(col("event_type"), col("h"))

  def oHourlyCusum: String =
    """WITH RECURSIVE b AS (
      |  SELECT date_trunc('hour', min(ts)) AS h0,
      |         date_trunc('hour', max(ts)) AS hn FROM events),
      |g AS (SELECT unnest(generate_series(h0, hn, INTERVAL 1 HOUR)) AS h FROM b),
      |c AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT DISTINCT event_type FROM c),
      |d AS (
      |  SELECT t.event_type, g.h, CAST(coalesce(c.x, 0) AS BIGINT) AS x
      |  FROM t CROSS JOIN g
      |  LEFT JOIN c ON c.event_type = t.event_type AND c.h = g.h),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx
      |  FROM d GROUP BY 1),
      |q AS (
      |  SELECT d.*, row_number() OVER (PARTITION BY d.event_type
      |    ORDER BY d.h) AS rn FROM d),
      |r AS (
      |  SELECT q.event_type, q.h, q.x, q.rn,
      |         GREATEST(0, 10 * s.n * q.x - 11 * s.sx) AS dd
      |  FROM q JOIN s USING (event_type) WHERE q.rn = 1
      |  UNION ALL
      |  SELECT q.event_type, q.h, q.x, q.rn,
      |         GREATEST(0, r.dd + 10 * s.n * q.x - 11 * s.sx)
      |  FROM r JOIN q ON q.event_type = r.event_type AND q.rn = r.rn + 1
      |  JOIN s ON s.event_type = q.event_type)
      |SELECT r.event_type, r.h, r.x AS n_events, CAST(r.dd AS BIGINT) AS cusum_d,
      |  r.dd > 50 * s.sx AS alarm
      |FROM r JOIN s ON s.event_type = r.event_type
      |ORDER BY 1, 2""".stripMargin
}
