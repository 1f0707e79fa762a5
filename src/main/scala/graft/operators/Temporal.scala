package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** Time-series densification and ordered-sequence analytics over the
  * events stream — the temporal operators a warehouse adds on top of
  * plain windows: gap-filling with interpolation (dashboard-ready
  * regular grids from irregular events) and step funnels (ordered
  * conversion chains).
  */
object Temporal {

  /** Epoch hour of a timestamp: seconds truncate toward zero (all
    * fixture data is post-1970; mirrored as floor(epoch()) in DuckDB). */
  private def epochHour(ts: org.apache.spark.sql.Column) =
    floor(ts.cast("long") / lit(3600)).cast("long")

  /** Hourly gap-fill with linear interpolation, per user: aggregate
    * observed events to an exact hourly mean (decimal-sum discipline),
    * expand each user's [first, last] hour to a dense grid, and fill
    * missing hours by interpolating between the bracketing observations.
    *
    * Scale shape: everything is keyed by user_id — the hourly aggregate,
    * the span expansion, the grid join, and the fill window share one
    * partitioning, so the plan is one logical shuffle plus the window
    * sort; the grid explode is map-side. Span length is bounded by the
    * retention window (hours per user ≤ retention), so the expansion is
    * a constant factor, never n².
    *
    * Exactness: hourly means are exact decimal sums ÷ counts (one double
    * division); interpolation is `vp + ((vn−vp)·Δh)/span` with the
    * operation order written identically in the DuckDB twin, so the
    * doubles are bit-equal. Observed hours keep their mean untouched
    * (`is_observed` = true). */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("user_id"), epochHour(col("ts")).as("hr"), col("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"), col("hr"))
      .agg(Exprs.exactAvg(col("value")).as("v"))
    // One pass, not grid-join-and-bracket: every gap hour lies strictly
    // between two CONSECUTIVE observed hours of its user (the grid spans
    // [min hr, max hr] OF OBSERVATIONS), so its brackets are exactly the
    // observed row before it and that row's lead(). Each observed row
    // therefore GENERATES itself plus the gap rows up to the next
    // observation — explode(sequence(hr, next_hr−1)) — carrying both
    // brackets with it. This removes, versus the r1–r16 shape: the
    // grid aggregate, the grid⋈hourly join (whose hourly leg recomputed
    // the events scan + hourly aggregate a second time), and the second
    // (descending) window sort — 4 exchanges → 2, 2 source scans → 1.
    // The interpolation expression is kept OPERATION-IDENTICAL to the
    // old two-window form (pv + ((nv−pv)·Δh)/span with the same casts),
    // so the doubles — and the DuckDB oracle hash — are bit-equal.
    val wNext = Window.partitionBy("user_id").orderBy(col("hr").asc)
    hourly
      .withColumn("nh", lead(col("hr"), 1).over(wNext))
      .withColumn("nv", lead(col("v"), 1).over(wNext))
      .select(col("user_id"), col("hr").as("ph"), col("v").as("pv"),
        col("nh"), col("nv"),
        explode(sequence(col("hr"),
          coalesce(col("nh") - lit(1L), col("hr")))).as("hr"))
      .select(col("user_id"), col("hr").as("epoch_hr"),
        when(col("hr") === col("ph"), col("pv")).otherwise(
          col("pv") + ((col("nv") - col("pv")) * (col("hr") - col("ph")).cast("double")) /
            (col("nh") - col("ph")).cast("double")).as("value"),
        (col("hr") === col("ph")).as("is_observed"))
  }

  def qGapFillHourly(spark: SparkSession, dir: String): DataFrame =
    gapFillHourly(Tables.events(spark, dir)).orderBy("user_id", "epoch_hr")

  def oGapFillHourly: String =
    """WITH hourly AS (
      |  SELECT user_id, CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
      |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(value) AS v
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY 1),
      |grid AS (
      |  SELECT s.user_id, g.hr
      |  FROM span s, LATERAL (SELECT unnest(range(s.lo, s.hi + 1)) AS hr) g),
      |joined AS (
      |  SELECT g.user_id, g.hr, h.v FROM grid g
      |  LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr),
      |filled AS (
      |  SELECT user_id, hr, v,
      |    last_value(v IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY hr
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY hr
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
      |    first_value(v IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY hr
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY hr
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      |  FROM joined)
      |SELECT user_id, hr AS epoch_hr,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE pv + ((nv - pv) * CAST(hr - ph AS DOUBLE)) / CAST(nh - ph AS DOUBLE)
      |  END AS value,
      |  v IS NOT NULL AS is_observed
      |FROM filled ORDER BY user_id, epoch_hr""".stripMargin

  /** Rolling z-score anomaly detection per user: each event scored
    * against the previous `window` events' mean/variance (current row
    * excluded — an outlier must not mask itself).
    *
    * Exactness: with S = Σv and Q = Σv² over the trailing window as
    * EXACT decimals (values are ≤2-decimal measures), the z-score test
    * z² > k² is the polynomial identity (n·x − S)² > k²·(n·Q − S²) —
    * no sqrt, no libm, every comparison exact, so the anomaly FLAG
    * itself hash-matches across engines, not just approximately. z² is
    * emitted as one double division of two exact decimals (bit-equal in
    * the twin). Scale shape: one window shuffle on user_id; the frame is
    * a bounded ROWS frame, incremental in the window engine.
    *
    * `minHistory` suppresses scores until the window has enough
    * observations for a meaningful baseline. */
  def rollingAnomalies(events: DataFrame, window: Int = 24, k: Int = 3,
      minHistory: Int = 12): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-window, -1)
    // every intermediate is cast to an explicitly BOUNDED decimal type
    // (measure < 10^6, window ≤ 999 rows) so no product ever reaches the
    // 38-digit cap where Spark/DuckDB would silently round the scale —
    // unchecked growth hits 38 at the s² term and breaks exactness
    val d = col("value").cast(DecimalType(8, 2))
    events
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        d.as("d"),
        sum(d).over(w).cast(DecimalType(12, 2)).as("s"),
        sum((d * d).cast(DecimalType(16, 4))).over(w)
          .cast(DecimalType(20, 4)).as("q"),
        count(col("value")).over(w).cast(DecimalType(3, 0)).as("n"))
      .filter(col("n") >= minHistory)
      .withColumn("num",
        ((col("n") * col("d") - col("s")) * (col("n") * col("d") - col("s")))
          .cast(DecimalType(30, 4)))
      .withColumn("den",
        (col("n") * col("q") - col("s") * col("s")).cast(DecimalType(30, 4)))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        // zero-variance history (den = 0): z is undefined — NULL in both
        // engines explicitly, rather than engine-specific inf/error; the
        // FLAG still fires there (num > 0 means any deviation from a
        // constant baseline is infinitely surprising)
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") / col("den").cast("double"))
          .as("z2"),
        (col("num") > lit(k * k) * col("den")).as("is_anomaly"))
  }

  def qRollingAnomalies(spark: SparkSession, dir: String): DataFrame =
    rollingAnomalies(Tables.events(spark, dir))
      .orderBy("user_id", "ts", "event_id")

  def oRollingAnomalies: String =
    """WITH v AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST(value AS DECIMAL(8,2)) AS d
      |  FROM events WHERE value IS NOT NULL),
      |win AS (
      |  SELECT user_id, event_id, ts, value, d,
      |    CAST(SUM(d) OVER w AS DECIMAL(12,2)) AS s,
      |    CAST(SUM(CAST(d * d AS DECIMAL(16,4))) OVER w AS DECIMAL(20,4)) AS q,
      |    CAST(COUNT(d) OVER w AS DECIMAL(3,0)) AS n
      |  FROM v
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |nd AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST((n * d - s) * (n * d - s) AS DECIMAL(30,4)) AS num,
      |    CAST(n * q - s * s AS DECIMAL(30,4)) AS den
      |  FROM win WHERE n >= 12)
      |SELECT user_id, event_id, ts, value,
      |  CASE WHEN den = 0 THEN NULL
      |       ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS z2,
      |  num > 9 * den AS is_anomaly
      |FROM nd
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** Ordered conversion funnel: the earliest chain s1 → s2 → s3 per
    * user, each step strictly after the previous step's earliest
    * completion (the standard "first conversion path" definition).
    *
    * Scale shape: three aggregations all keyed by user_id (the funnel's
    * natural partitioning) — step N's frame joins step N−1's tiny
    * (≤ one row per user) result back to the events of type N, so
    * every exchange is user-keyed and the event table is scanned once
    * per step with the type filter pushed to the scan. No windows over
    * the full event stream, no cross-step explosion. */
  def eventFunnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size == 3, "three-step funnel")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === steps(0))
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === steps(1))
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === steps(2))
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
          + when(col("t3").isNotNull, 1).otherwise(0)).as("steps_reached"))
  }

  def qEventFunnel(spark: SparkSession, dir: String): DataFrame =
    eventFunnel(Tables.events(spark, dir)).orderBy("user_id")

  def oEventFunnel: String =
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN t1 ON t1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN t2 ON t2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
      |SELECT t1.user_id, t1.t1, t2.t2, t3.t3,
      |  CAST(1 + CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END
      |         + CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
      |    AS steps_reached
      |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
      |LEFT JOIN t3 ON t1.user_id = t3.user_id
      |ORDER BY t1.user_id""".stripMargin

  // --- conversion latency ----------------------------------------------

  /** Time-to-convert: per user, the latency from FIRST view to the
    * first purchase at or after it, summarized as exact interpolated
    * percentiles (the `percentile`/`quantile_cont` cross-engine
    * discipline) plus conversion counts — the funnel's "how long", next
    * to [[eventFunnel]]'s "how many".
    *
    * Scale shape: both firsts are conditional min aggregates in ONE
    * user-keyed pass (no join); latencies are integer microsecond
    * deltas; the percentile summary reduces #users rows to one. */
  def conversionLatency(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("first_view_us"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("first_purchase_any_us"))
    // the purchase must not precede the first view; re-derive the
    // first qualifying purchase with a second conditional min keyed on
    // the (broadcast-joined) first view — still join-free per user in
    // the common case where purchases follow views, exact in all cases
    val qualified = events
      .join(perUser.select(col("user_id"), col("first_view_us")), Seq("user_id"))
      .groupBy(col("user_id"), col("first_view_us"))
      .agg(min(when(col("event_type") === "purchase" &&
        unix_micros(col("ts")) >= col("first_view_us"),
        unix_micros(col("ts")))).as("first_purchase_us"))
    val lat = qualified
      .withColumn("latency_s",
        ((col("first_purchase_us") - col("first_view_us")) / lit(1000000L))
          .cast("double"))
    lat.agg(
      count(lit(1)).as("n_users"),
      count(col("first_view_us")).as("n_viewers"),
      count(col("latency_s")).as("n_converted"),
      expr("percentile(latency_s, 0.25)").as("p25_s"),
      expr("percentile(latency_s, 0.5)").as("p50_s"),
      expr("percentile(latency_s, 0.9)").as("p90_s"))
  }

  def qConversionLatency(spark: SparkSession, dir: String): DataFrame =
    conversionLatency(Tables.events(spark, dir))

  val oConversionLatency: String =
    """WITH fv AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us
      |  FROM events GROUP BY user_id),
      |q AS (
      |  SELECT e.user_id, fv.first_view_us,
      |    min(CASE WHEN e.event_type = 'purchase'
      |             AND epoch_us(e.ts) >= fv.first_view_us
      |        THEN epoch_us(e.ts) END) AS first_purchase_us
      |  FROM events e JOIN fv USING (user_id)
      |  GROUP BY e.user_id, fv.first_view_us),
      |lat AS (
      |  SELECT user_id, first_view_us,
      |    CAST((first_purchase_us - first_view_us) / 1000000 AS DOUBLE) AS latency_s
      |  FROM q)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(first_view_us) AS BIGINT) AS n_viewers,
      |  CAST(count(latency_s) AS BIGINT) AS n_converted,
      |  quantile_cont(latency_s, 0.25) AS p25_s,
      |  quantile_cont(latency_s, 0.5) AS p50_s,
      |  quantile_cont(latency_s, 0.9) AS p90_s
      |FROM lat""".stripMargin

  // --- cohort retention ------------------------------------------------

  /** Weekly cohort retention: users grouped by first-seen week, each
    * cohort's active-user count per week offset, and the retention
    * ratio — the table behind every retention curve. ISO week
    * truncation (Monday start) matches between engines, both weeks are
    * truncated before differencing so offsets are exact multiples of 7
    * days, and retention is one exact integer division.
    *
    * Scale shape: one shuffle to find first-seen weeks (partial min),
    * one distinct on (user, week) — both partial-aggregable — then a
    * user-keyed join that reuses the distinct's partitioning, and a
    * #cohorts×#offsets-sized aggregate. Nothing holds per-user state
    * beyond the aggregation buffers. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firsts = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val activity = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val counts = activity.join(firsts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    counts.join(sizes, Seq("cohort_week"))
      .withColumn("retention", col("active_users") / col("cohort_size"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_size"), col("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def qCohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables.events(spark, dir))

  val oCohortRetention: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      |  FROM events GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
      |counts AS (
      |  SELECT cohort_week,
      |    CAST(date_diff('day', cohort_week, week) // 7 AS INTEGER) AS week_offset,
      |    CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
      |  FROM activity a JOIN firsts f USING (user_id)
      |  GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM firsts GROUP BY 1)
      |SELECT cohort_week, week_offset, active_users, cohort_size,
      |  CAST(active_users AS DOUBLE) / cohort_size AS retention
      |FROM counts JOIN sizes USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin

  // --- debounce (chain-dependent rate limiting) -----------------------

  /** Microsecond epoch of a Timestamp (getTime is millis — it would
    * truncate the fixture's microsecond timestamps). */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Per-key debounce: keep an event only if it is at least `delta`
    * after the last KEPT event of that key (the first event is always
    * kept). This is CHAIN-dependent — whether an event survives depends
    * on which earlier events survived — so no window/lag composition
    * expresses it (lag-based thinning drops different rows: a burst of
    * N events inside Δ keeps 1 here but re-arms on every dropped event
    * there). The per-key greedy scan is genuine sequential-per-group
    * logic, so this uses the typed API's `flatMapSortedGroups`: ONE
    * shuffle on the key, and the sort rides the shuffle's secondary
    * sort rather than materializing per-group arrays — per-executor
    * state is one long per open group. Uses: burst collapse / alert
    * throttling / keyframe sampling in event and sensor pipelines.
    *
    * The DuckDB twin replays the same chain as a recursive CTE (one
    * kept event per key per recursion step, `min_by` over the
    * rn-ordered remainder), so the gate is a full hash match. */
  def debounce(events: DataFrame, deltaSeconds: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val deltaMicros = deltaSeconds * 1000000L
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts"), col("event_id")) { (_, it) =>
        var lastKept = Long.MinValue / 2
        it.filter { e =>
          val t = micros(e._2)
          if (t >= lastKept + deltaMicros) { lastKept = t; true } else false
        }
      }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
  }

  val DebounceSeconds: Long = 12 * 3600L

  def qDebounce(spark: SparkSession, dir: String): DataFrame =
    debounce(Tables.events(spark, dir), DebounceSeconds).orderBy("event_id")

  def oDebounce: String =
    s"""WITH RECURSIVE e AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |k(user_id, ts, event_id, rn) AS (
      |  SELECT user_id, min_by(ts, rn), min_by(event_id, rn),
      |    CAST(min(rn) AS BIGINT)
      |  FROM e GROUP BY user_id
      |  UNION ALL
      |  SELECT k.user_id, min_by(n.ts, n.rn), min_by(n.event_id, n.rn),
      |    CAST(min(n.rn) AS BIGINT)
      |  FROM k JOIN e n ON n.user_id = k.user_id
      |    AND n.ts >= k.ts + INTERVAL ${DebounceSeconds} SECOND
      |  GROUP BY k.user_id, k.ts, k.event_id, k.rn)
      |SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
      |FROM k JOIN e ON k.user_id = e.user_id AND k.rn = e.rn
      |ORDER BY e.event_id""".stripMargin

  /** Time-weighted average per user — the metrics/IoT aggregate where a
    * plain mean over-weights bursty sampling: each reading holds until
    * the next one (zero-order hold), so its weight is its holding
    * duration. All arithmetic is exact integer: values become CENTS via
    * the shared round-half-away double→BIGINT path, durations are
    * microsecond deltas from one lag window, and the final average is a
    * floor division — so the gate is a full hash match, with overflow
    * headroom audited (|cents| ≤ 10⁵ × span ≤ 10¹³ µs « 2⁶³; the span
    * is wall-clock, so headroom is SF-independent). One window shuffle
    * on user_id feeding a partial-agg'd hash aggregate; single-reading
    * users have no holding interval and are reported with NULL twa
    * rather than dropped. */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("dt_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        coalesce(sum(col("dt_us")), lit(0L)).as("span_us"),
        sum(col("cents") * col("dt_us")).as("weighted_cents_us"))
      .withColumn("twa_cents",
        expr("CASE WHEN span_us > 0 THEN weighted_cents_us div span_us END"))
  }

  def qTimeWeightedAvg(spark: SparkSession, dir: String): DataFrame =
    timeWeightedAvg(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** Hopping (sliding) time-window aggregate — `window(ts, 1h, 30m)`:
    * every event lands in exactly size/slide = 2 overlapping windows,
    * the streaming-dashboard shape run in batch (the same `window()`
    * expression Structured Streaming plans, so numbers here are the
    * batch twins of a live hop dashboard). Spark expands each row into
    * its covering windows BEFORE the aggregate, so partial aggregation
    * still applies: the shuffle carries (windows × groups) partials,
    * size/slide × the tumbling cost — the dial a 100 TB deployment
    * tunes by widening the slide. Exact integer cent sums. */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_cents"))

  def qHoppingAgg(spark: SparkSession, dir: String): DataFrame =
    hoppingAgg(Tables.events(spark, dir))
      .orderBy(col("w_start"), col("event_type"))

  /** Twin: each event's 2 covering 30-minute-aligned window starts via
    * explicit unnest (b and b − 30 min where b = time_bucket(30m, ts));
    * epoch-aligned exactly like Spark's window(). */
  def oHoppingAgg: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    unnest([time_bucket(INTERVAL 30 MINUTE, ts),
      |            time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
      |      AS w_start
      |  FROM events)
      |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
      |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM e GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin

  def oTimeWeightedAvg: String =
    """WITH d AS (
      |  SELECT user_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_us(ts) AS dt_us
      |  FROM events)
      |SELECT user_id, count(*) AS n_samples,
      |  CAST(COALESCE(sum(dt_us), 0) AS BIGINT) AS span_us,
      |  CAST(sum(cents * dt_us) AS BIGINT) AS weighted_cents_us,
      |  CASE WHEN CAST(COALESCE(sum(dt_us), 0) AS BIGINT) > 0
      |    THEN CAST(sum(cents * dt_us) AS BIGINT) // CAST(sum(dt_us) AS BIGINT)
      |  END AS twa_cents
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin
}
