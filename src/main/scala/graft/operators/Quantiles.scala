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
    val n = slim.count()
    val targets = ps.map(p => p -> math.ceil(p * n).toLong)
    Scale.globalRank(slim, Seq(col("value"), col("event_id")), "rn", nPartitions)
      .join(broadcast(targets.toDF("p", "rn")), Seq("rn"))
      .select(col("p"), col("value"))
  }

  def qQuantilesScalable(spark: SparkSession, dir: String): DataFrame =
    quantilesScalable(Tables.events(spark, dir)).orderBy(col("p"))

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
