package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Serving-layer growth accounting and rank-based feature
  * normalization.
  */
object Growth {

  /** Daily user growth: new users (first ever seen that day), daily
    * active users, and the running total of distinct users to date.
    * Exact running-distinct is normally the expensive ask — here it
    * falls out for free because Σ(new users/day) IS the running
    * distinct count: each user contributes to exactly one day's news.
    * Scale shape: one user-grain min-aggregate (partial-agg friendly),
    * one day-grain count, a ≤#days cumulative window — the running
    * window is over calendar days, never rows. */
  def userGrowth(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"))
    val newPerDay = firstSeen.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    val activePerDay = events.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val wRun = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    activePerDay.join(newPerDay, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("total_users", sum(col("new_users")).over(wRun).cast("long"))
      .select(col("day"), col("new_users"), col("active_users"),
        col("total_users"))
  }

  def qUserGrowth(spark: SparkSession, dir: String): DataFrame =
    userGrowth(Tables.events(spark, dir)).orderBy(col("day"))

  def oUserGrowth: String =
    """WITH fs AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      |  FROM events GROUP BY user_id),
      |np AS (SELECT first_day AS day, count(*) AS new_users
      |       FROM fs GROUP BY first_day),
      |ap AS (SELECT day, count(*) AS active_users
      |       FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
      |       GROUP BY day)
      |SELECT ap.day,
      |  CAST(coalesce(np.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(ap.active_users AS BIGINT) AS active_users,
      |  CAST(sum(coalesce(np.new_users, 0)) OVER (ORDER BY ap.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS total_users
      |FROM ap LEFT JOIN np ON ap.day = np.day
      |ORDER BY ap.day""".stripMargin

  // -------------------------------------------- rank normalization

  /** Percentile-rank feature transform: value → ⌊rank·1000/n⌋ over the
    * (value, id) total order — the rank-normalization step that makes
    * features comparable across arbitrarily-shaped distributions, exact
    * and model-free. Ranks come from [[Scale.globalRank]], so the
    * transform has no single-task sort; the output keeps raw and
    * normalized values side by side. Bounded to a deterministic sample
    * of the stream in the query (the transform itself is corpus-wide).
    */
  def rankNormalize(events: DataFrame, nPartitions: Int = 8): DataFrame = {
    val slim = events.select(col("event_id"), col("value"))
    // n rides the rank's already-collected offsets control plane — the
    // old separate count() was a whole extra pass over the input
    val (ranked, n) =
      Scale.globalRankWithTotal(slim, Seq(col("value"), col("event_id")),
        "rnk", nPartitions)
    ranked
      .withColumn("pct_milli",
        floor(col("rnk") * lit(1000L) / lit(n)).cast("long"))
      .select(col("event_id"), col("value"), col("rnk"), col("pct_milli"))
  }

  def qRankNormalize(spark: SparkSession, dir: String): DataFrame =
    rankNormalize(Tables.events(spark, dir))
      .filter(col("event_id") < 2000)
      .orderBy(col("event_id"))

  def oRankNormalize: String =
    """WITH r AS (
      |  SELECT event_id, value,
      |    row_number() OVER (ORDER BY value, event_id) AS rnk,
      |    count(*) OVER () AS n
      |  FROM events)
      |SELECT event_id, value, CAST(rnk AS BIGINT) AS rnk,
      |       CAST(floor(rnk * 1000 / n) AS BIGINT) AS pct_milli
      |FROM r WHERE event_id < 2000 ORDER BY event_id""".stripMargin
}
