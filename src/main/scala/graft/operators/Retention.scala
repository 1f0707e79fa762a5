package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cohort retention matrix — day-N retention per first-seen cohort, the
  * product-analytics staple next to [[Ltv.cohortLtv]]'s revenue
  * triangle: of the users first active on day D, what fraction were
  * active again on D+n?
  *
  * Exactness: counts are DISTINCT user-days (exact integers after the
  * dedup), retention is the ⌊·1000⌋ surrogate on them. Offset 0 is the
  * cohort itself (retention 1000 by construction — kept as the
  * self-check row).
  *
  * Scale shape (100 TB): the event stream reduces to distinct
  * (user, day) FIRST (one partial-agg shuffle — nothing downstream
  * scales with event volume), first-day is a user-grain min-agg
  * reusing the same shuffle key, and the matrix is a ≤ #days ×
  * [[MaxOffset]] aggregate. */
object Retention {

  val MaxOffset = 13

  def retentionMatrix(events: DataFrame, maxOffset: Int = MaxOffset): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstDay = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val sizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    userDays.join(firstDay, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("offset"))
      .agg(count(lit(1)).as("n_retained"))
      .join(sizes, Seq("cohort_day"))
      .withColumn("retention_milli",
        floor(col("n_retained") * lit(1000L).cast("double") / col("n_cohort"))
          .cast("long"))
      .select(col("cohort_day"), col("offset"), col("n_cohort"),
        col("n_retained"), col("retention_milli"))
  }

  def qRetentionMatrix(spark: SparkSession, dir: String): DataFrame =
    retentionMatrix(Tables.events(spark, dir))
      .orderBy(col("cohort_day"), col("offset"))

  def oRetentionMatrix: String =
    s"""WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |fd AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1),
      |sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_cohort
      |       FROM fd GROUP BY 1),
      |m AS (
      |  SELECT fd.cohort_day,
      |    CAST(date_diff('day', fd.cohort_day, ud.day) AS BIGINT) AS "offset",
      |    CAST(count(*) AS BIGINT) AS n_retained
      |  FROM ud JOIN fd USING (user_id)
      |  WHERE date_diff('day', fd.cohort_day, ud.day) <= $MaxOffset
      |  GROUP BY 1, 2)
      |SELECT m.cohort_day, m."offset", sz.n_cohort, m.n_retained,
      |  CAST(floor(m.n_retained * CAST(1000 AS DOUBLE) / sz.n_cohort) AS BIGINT)
      |    AS retention_milli
      |FROM m JOIN sz USING (cohort_day)
      |ORDER BY 1, 2""".stripMargin
}
