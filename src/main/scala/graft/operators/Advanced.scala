package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational surface beyond the reference's own usage that any engine
  * consumer expects: subqueries (scalar / IN / correlated-EXISTS-with-
  * aggregate), grouping sets (ROLLUP/CUBE), and pivot. All exercise
  * Catalyst's decorrelation and expand operators; all oracle-checked.
  *
  * Scale notes: scalar subqueries broadcast a single row; decorrelated
  * EXISTS/IN become semi-joins (one shuffle or broadcast); ROLLUP/CUBE
  * expand rows by the number of grouping sets before the aggregate —
  * partial aggregation still applies per set, so the shuffle carries
  * (sets × groups) partials, not raw rows.
  */
object Advanced {

  private def dp(c: org.apache.spark.sql.Column) = c.cast(DecimalType(14, 2))

  /** Scalar subquery: parts priced above the average retail price. */
  def qAboveAvgParts(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("v_part")
    spark.sql(
      """SELECT p_partkey, p_name, p_retailprice
        |FROM v_part
        |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE)
        |                              / COUNT(p_retailprice) FROM v_part)
        |ORDER BY p_partkey""".stripMargin)
  }

  def oAboveAvgParts: String =
    """SELECT p_partkey, p_name, p_retailprice
      |FROM part
      |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE)
      |                              / COUNT(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** Correlated aggregate subquery (TPC-H Q18 shape): orders whose total
    * line quantity exceeds a threshold, via HAVING + IN. */
  def qLargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dp(col("l_quantity"))).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_orderkey"))
  }

  def oLargeOrders: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |             CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) > 150.0) b
      |  ON o_orderkey = b.l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** ROLLUP over (event_type, year, month): subtotal rows per level. */
  def qRollupCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), year(col("ts")).as("year"), month(col("ts")).as("month"))
      .rollup(col("event_type"), col("year"), col("month"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first, col("year").asc_nulls_first,
        col("month").asc_nulls_first)

  def oRollupCounts: String =
    """SELECT event_type, CAST(year(ts) AS INTEGER) AS year,
      |       CAST(month(ts) AS INTEGER) AS month, COUNT(*) AS n
      |FROM events
      |GROUP BY ROLLUP (event_type, year(ts), month(ts))
      |ORDER BY event_type ASC NULLS FIRST, year ASC NULLS FIRST,
      |         month ASC NULLS FIRST""".stripMargin

  /** CUBE over (event_type, is_day-band): all grouping combinations. */
  def qCubeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        (hour(col("ts")).between(7, 18)).as("is_day"), col("value"))
      .cube(col("event_type"), col("is_day"))
      .agg(count(lit(1)).as("n"),
        sum(dp(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("is_day").asc_nulls_first)

  def oCubeStats: String =
    """SELECT event_type, hour(ts) BETWEEN 7 AND 18 AS is_day,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY CUBE (event_type, hour(ts) BETWEEN 7 AND 18)
      |ORDER BY event_type ASC NULLS FIRST, is_day ASC NULLS FIRST""".stripMargin

  /** Pivot: daily record counts, one column per event type. Oracle uses
    * explicit conditional aggregation (the portable form of PIVOT). */
  def qPivotDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("date"), col("event_type"))
      .groupBy(col("date"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("date"))

  def oPivotDaily: String =
    """SELECT CAST(ts AS DATE) AS date,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY CAST(ts AS DATE) ORDER BY date""".stripMargin

  /** Anti-join via NOT IN with null-safe semantics: parts never ordered.
    * (NOT IN over a nullable column is the classic SQL trap; l_partkey is
    * non-null here, so both engines agree.) */
  def qUnorderedParts(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("v_part2")
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem2")
    spark.sql(
      """SELECT p_partkey, p_name FROM v_part2
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM v_lineitem2)
        |ORDER BY p_partkey""".stripMargin)
  }

  def oUnorderedParts: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
      |ORDER BY p_partkey""".stripMargin

  /** INTERSECT (distinct semantics): customers active in both 1999 and
    * 2000. Plans as a left-semi join + distinct — one shuffle per side.
    * The year filter is expressed as a date range, not `year(col) = y`:
    * range predicates are sargable, so they push into the parquet scan
    * and prune row groups; a function call on the column would not. */
  def qSetIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def active(y: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    active(1999).intersect(active(2000)).orderBy(col("o_custkey"))
  }

  def oSetIntersect: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT (distinct semantics): customers with no orders at all —
    * plans as a left-anti join + distinct. */
  def qSetExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"))
      .except(Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey")))
      .orderBy(col("c_custkey"))

  def oSetExcept: String =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin

  /** Analytic window functions: lag/lead offsets plus a running frame
    * aggregate, per user in event-time order. One shuffle on the
    * partition key, per-key sort, frames evaluated incrementally.
    * Running sum goes through decimal so both engines accumulate
    * exactly; event_id breaks ts ties so offsets are deterministic. */
  def qEventDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_event_id", lead(col("event_id"), 1).over(w))
      .withColumn("gap_micros",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("running_sum",
        sum(dp(col("value"))).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).cast("double"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  def oEventDeltas: String =
    """SELECT user_id, event_id, ts, value,
      |  lag(value) OVER w AS prev_value,
      |  lead(event_id) OVER w AS next_event_id,
      |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_micros,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** One-pass table profile: per-column null counts, exact distincts,
    * and value/time ranges in a single global aggregate — the audit
    * every pipeline runs before trusting a new drop of data. Two exact
    * COUNT(DISTINCT)s force an Expand-based aggregate; that is the
    * deliberate exact twin of qSketchStats' HLL path (which is what
    * this becomes at 100 TB when exact distinct state outgrows
    * executors). Map-side partial aggregation still applies to every
    * non-distinct column. */
  def profile(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("user_id_nulls"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("value_nulls"),
      countDistinct(col("event_type")).as("event_types"),
      countDistinct(col("user_id")).as("distinct_users"),
      min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
      min(col("value")).as("min_value"), max(col("value")).as("max_value"))

  def qProfileEvents(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.events(spark, dir))

  /** first/last/nth value over the full-partition frame: the "compare
    * each event to its user's journey endpoints" shape. The frame must
    * be UNBOUNDED..UNBOUNDED — last_value over the default frame
    * (..CURRENT ROW) degenerates to the row itself, a classic silent
    * bug both engines share, which the oracle twin pins against. */
  def qValueBounds(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("first_amt", first(col("value")).over(w))
      .withColumn("last_amt", last(col("value")).over(w))
      .withColumn("second_event", nth_value(col("event_id"), 2).over(w))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  def oValueBounds: String =
    """SELECT user_id, event_id, ts, value,
      |  first_value(value) OVER w AS first_amt,
      |  last_value(value) OVER w AS last_amt,
      |  nth_value(event_id, 2) OVER w AS second_event
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** GROUPING SETS with an engine-independent grouping id: per-column
    * GROUPING() (SQL standard, 1 = column aggregated away) composed into
    * an explicit gid instead of the built-in grouping_id(), whose bit
    * order is an engine convention. Unlike recovering set membership
    * from column null-ness, this stays collision-free when the DATA
    * holds NULL grouping values (Silver.clean passes NULL event_type
    * through): a NULL-event_type subtotal row keeps gid 1 and never
    * collides with the grand-total row. NULL ordering is pinned FIRST
    * on both engines (Spark's asc default; DuckDB defaults LAST). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    groupingSetsAgg(Silver.enrich(Silver.clean(Tables.events(spark, dir))))

  /** The aggregate body, on any frame with (event_type, year, value) —
    * split out so specs can drive it with planted NULL event_type. */
  private[graft] def groupingSetsAgg(enriched: DataFrame): DataFrame =
    enriched
      .groupingSets(Seq(Seq(col("event_type")), Seq(col("year")), Seq.empty),
        col("event_type"), col("year"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.Exprs.dec2(col("value"))).cast("double").as("sum_value"),
        (grouping(col("event_type")).cast("int") * 2
          + grouping(col("year")).cast("int")).as("gid"))
      .select(col("event_type"), col("year"), col("n"), col("sum_value"), col("gid"))
      .orderBy(col("gid"), col("event_type").asc_nulls_first, col("year").asc_nulls_first)

  def oGroupingSets: String =
    s"""WITH ${graft.Oracles.cleanedCte}, ${graft.Oracles.enrichedCte}
       |SELECT event_type, year, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
       |  CAST(GROUPING(event_type) * 2 + GROUPING(year) AS INTEGER) AS gid
       |FROM enriched
       |GROUP BY GROUPING SETS ((event_type), (year), ())
       |ORDER BY gid, event_type NULLS FIRST, year NULLS FIRST""".stripMargin

  /** UNPIVOT (wide → long), the inverse of the pivot query: Spark's
    * Dataset.unpivot (melt) keeps the id columns and turns the measure
    * columns into (metric, value) rows — map-only, no shuffle beyond
    * the feeding aggregate, and the long form is what metric stores
    * and plotting layers ingest. */
  def qUnpivotDaily(spark: SparkSession, dir: String): DataFrame =
    Silver.dailyAgg(Silver.enrich(Silver.clean(Tables.events(spark, dir))))
      .unpivot(
        Array(col("event_type"), col("year"), col("month"), col("day")),
        Array(col("avg_value"), col("min_value"), col("max_value"), col("sum_value")),
        "metric", "value")
      .orderBy(col("event_type"), col("year"), col("month"), col("day"), col("metric"))

  def oUnpivotDaily: String =
    s"""WITH ${graft.Oracles.cleanedCte}, ${graft.Oracles.enrichedCte},
       |d AS (${graft.Oracles.dailyAggSelect})
       |SELECT event_type, year, month, day, 'avg_value' AS metric, avg_value AS value FROM d
       |UNION ALL SELECT event_type, year, month, day, 'min_value', min_value FROM d
       |UNION ALL SELECT event_type, year, month, day, 'max_value', max_value FROM d
       |UNION ALL SELECT event_type, year, month, day, 'sum_value', sum_value FROM d
       |ORDER BY event_type, year, month, day, metric""".stripMargin

  /** Time-based RANGE frame: trailing-hour moving sum per user. ROWS
    * frames count rows; RANGE frames bound by ORDER-key VALUE distance,
    * which is what sliding time-window analytics actually mean — rows
    * landing in the same second share a frame regardless of tie order,
    * so the result is deterministic without a tiebreak in the window
    * ordering. Epoch seconds via floor on both engines (Spark's
    * timestamp→long cast floors; DuckDB's epoch() is fractional). */
  def qRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").cast("long"))
      .rangeBetween(-3599, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("hour_sum", sum(dp(col("value"))).over(w).cast("double"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  def oRangeFrame: String =
    """SELECT user_id, event_id, ts, value,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  /** Exact percentiles per group (the precise twin of qSketchStats'
    * percentile_approx): Spark's `percentile` and DuckDB's
    * `quantile_cont` both sort and linearly interpolate at rank
    * (n-1)*p, so the doubles hash-match bit-for-bit. Exact percentile
    * state is O(group rows) — at 100 TB this is the small-group path;
    * the sketch variant beside it is the unbounded-group path. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .orderBy(col("event_type"))

  def oPercentiles: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def oProfileEvents: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
      |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS event_types,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
      |  MIN(ts) AS min_ts, MAX(ts) AS max_ts,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events""".stripMargin

  /** The full ANSI ranking-function family over ONE window, with
    * deliberate ties (price bucket) so rank/dense_rank/row_number
    * genuinely diverge: gap semantics (rank skips after ties),
    * dense semantics (no skips), the value-tie-broken row_number,
    * percent_rank = (rank−1)/(rows−1) and cume_dist as exact
    * small-integer ratios (bit-identical doubles in both engines), and
    * ntile(4) quartiles. One window shuffle on the partition key. */
  def qRankVariants(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("bucket"), col("o_orderkey"))
    val wTies = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("bucket"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 200)
      .withColumn("bucket", expr("CAST(floor(o_totalprice) AS BIGINT) div 10000"))
      .select(col("o_custkey"), col("o_orderkey"), col("bucket"),
        row_number().over(w).as("rn"),
        rank().over(wTies).as("rnk"),
        dense_rank().over(wTies).as("drnk"),
        percent_rank().over(wTies).as("prnk"),
        cume_dist().over(wTies).as("cdist"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  def oRankVariants: String =
    """SELECT o_custkey, o_orderkey, bucket,
      |  CAST(row_number() OVER wo AS INTEGER) AS rn,
      |  CAST(rank() OVER wt AS INTEGER) AS rnk,
      |  CAST(dense_rank() OVER wt AS INTEGER) AS drnk,
      |  percent_rank() OVER wt AS prnk,
      |  cume_dist() OVER wt AS cdist,
      |  CAST(ntile(4) OVER wo AS INTEGER) AS quartile
      |FROM (SELECT *, CAST(floor(o_totalprice) AS BIGINT) // 10000 AS bucket
      |      FROM orders WHERE o_custkey < 200)
      |WINDOW wo AS (PARTITION BY o_custkey ORDER BY bucket, o_orderkey),
      |       wt AS (PARTITION BY o_custkey ORDER BY bucket)
      |ORDER BY o_custkey, rn""".stripMargin
}
