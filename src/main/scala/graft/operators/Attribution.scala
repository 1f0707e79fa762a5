package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Last-touch marketing attribution: each purchase credits the user's
  * most recent view/click at-or-before it, provided it landed within
  * the attribution window; purchases with no qualifying touch report as
  * 'none'. The naive form is a per-purchase inequality join against the
  * touch stream; like [[Pit]], this never writes the inequality —
  * touches and purchases ride ONE user-keyed window ordered by
  * (ts, touch-before-purchase, event_id), and a running
  * last(ignoreNulls) hands every purchase its candidate touch; the
  * window cutoff is a residual filter on the carried timestamp.
  * One shuffle, linear in events.
  */
object Attribution {

  val WindowDays = 7
  val TouchTypes: Seq[String] = Seq("view", "click")

  def lastTouch(events: DataFrame,
      windowDays: Int = WindowDays): DataFrame = {
    val isTouch = col("event_type").isin(TouchTypes: _*)
    val u = events
      .filter(isTouch || col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
        when(isTouch, col("event_type")).as("touch_type"),
        when(isTouch, col("ts")).as("touch_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val horizonUs = windowDays.toLong * 86400L * 1000000L
    u
      .withColumn("lt", last(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("lts", last(col("touch_ts"), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .withColumn("attributed_type",
        when(col("lts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("lts")) <= horizonUs,
          col("lt")).otherwise("none"))
      .groupBy(col("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    lastTouch(Tables.events(spark, dir)).orderBy(col("attributed_type"))

  def oAttribution: String =
    s"""WITH u AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
      |    CASE WHEN event_type IN ('view', 'click') THEN event_type END AS touch_type,
      |    CASE WHEN event_type IN ('view', 'click') THEN ts END AS touch_ts
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |r AS (
      |  SELECT *,
      |    last_value(touch_type IGNORE NULLS) OVER w AS lt,
      |    last_value(touch_ts IGNORE NULLS) OVER w AS lts
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT CASE WHEN lts IS NOT NULL
      |              AND epoch_us(ts) - epoch_us(lts) <= ${WindowDays}::BIGINT * 86400 * 1000000
      |            THEN lt ELSE 'none' END AS attributed_type,
      |       CAST(count(*) AS BIGINT) AS n_purchases
      |FROM r WHERE is_p = 1
      |GROUP BY 1 ORDER BY attributed_type""".stripMargin
}
