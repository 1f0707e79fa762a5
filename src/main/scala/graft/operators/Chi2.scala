package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Chi-square test of independence for event type × weekday/weekend —
  * "does this event type's weekly rhythm differ from the site's?", the
  * categorical drift test next to [[Monitor]]'s value-drift histogram.
  *
  * Exactness: every observed/marginal count is an exact BIGINT, the
  * deviation d = O·N − R·C is computed in exact integers (cross-
  * multiplied — expected counts never materialize as rationals), and
  * each per-type contribution is ONE fixed-order double expression
  * `d²_wd/(R·C_wd·N) + d²_we/(R·C_we·N)` over exactly-representable
  * inputs — no data-order-dependent float summation anywhere, so the
  * DuckDB twin is bit-identical. No global χ² row is emitted: summing
  * across groups would need an ordered fold the relational layer can't
  * pin; per-type contributions ARE the actionable output (which type
  * deviates), and a reader sums 5 doubles if they want the statistic.
  *
  * Weekday convention: Spark `dayofweek` is Sun=1/Sat=7, DuckDB's is
  * Sun=0/Sat=6 — the twin compensates (the F-family rule).
  *
  * Scale shape (100 TB): one scan → 5-group partial+final aggregate;
  * marginals are a 1-row broadcast. Exact while O·N < 2⁶³. */
object Chi2 {

  def weekendIndependence(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"),
        dayofweek(col("ts")).isin(1, 7).cast("long").as("wk"))
      .groupBy(col("event_type"))
      .agg((count(lit(1)) - sum(col("wk"))).as("n_weekday"),
        sum(col("wk")).as("n_weekend"))
    val marg = cells.agg(sum(col("n_weekday") + col("n_weekend")).as("nn"),
      sum(col("n_weekday")).as("c_wd"), sum(col("n_weekend")).as("c_we"))
    cells.crossJoin(broadcast(marg))
      .withColumn("r", col("n_weekday") + col("n_weekend"))
      .withColumn("d_wd", col("n_weekday") * col("nn") - col("r") * col("c_wd"))
      .withColumn("d_we", col("n_weekend") * col("nn") - col("r") * col("c_we"))
      .withColumn("exp_weekday",
        col("r").cast("double") * col("c_wd").cast("double") / col("nn").cast("double"))
      .withColumn("exp_weekend",
        col("r").cast("double") * col("c_we").cast("double") / col("nn").cast("double"))
      .withColumn("chi2_contrib",
        col("d_wd").cast("double") * col("d_wd").cast("double") /
          (col("r").cast("double") * col("c_wd").cast("double") * col("nn").cast("double")) +
        col("d_we").cast("double") * col("d_we").cast("double") /
          (col("r").cast("double") * col("c_we").cast("double") * col("nn").cast("double")))
      .select(col("event_type"), col("n_weekday"), col("n_weekend"),
        col("exp_weekday"), col("exp_weekend"), col("chi2_contrib"))
  }

  def qWeekendIndependence(spark: SparkSession, dir: String): DataFrame =
    weekendIndependence(Tables.events(spark, dir)).orderBy(col("event_type"))

  def oWeekendIndependence: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk
      |  FROM events),
      |cells AS (
      |  SELECT event_type,
      |    CAST(count(*) - sum(wk) AS BIGINT) AS n_weekday,
      |    CAST(sum(wk) AS BIGINT) AS n_weekend
      |  FROM b GROUP BY 1),
      |m AS (
      |  SELECT CAST(sum(n_weekday + n_weekend) AS BIGINT) AS nn,
      |    CAST(sum(n_weekday) AS BIGINT) AS c_wd,
      |    CAST(sum(n_weekend) AS BIGINT) AS c_we
      |  FROM cells),
      |j AS (
      |  SELECT cells.*, m.nn, m.c_wd, m.c_we,
      |    n_weekday + n_weekend AS r,
      |    n_weekday * m.nn - (n_weekday + n_weekend) * m.c_wd AS d_wd,
      |    n_weekend * m.nn - (n_weekday + n_weekend) * m.c_we AS d_we
      |  FROM cells, m)
      |SELECT event_type, n_weekday, n_weekend,
      |  CAST(r AS DOUBLE) * CAST(c_wd AS DOUBLE) / CAST(nn AS DOUBLE) AS exp_weekday,
      |  CAST(r AS DOUBLE) * CAST(c_we AS DOUBLE) / CAST(nn AS DOUBLE) AS exp_weekend,
      |  CAST(d_wd AS DOUBLE) * CAST(d_wd AS DOUBLE)
      |    / (CAST(r AS DOUBLE) * CAST(c_wd AS DOUBLE) * CAST(nn AS DOUBLE))
      |  + CAST(d_we AS DOUBLE) * CAST(d_we AS DOUBLE)
      |    / (CAST(r AS DOUBLE) * CAST(c_we AS DOUBLE) * CAST(nn AS DOUBLE))
      |  AS chi2_contrib
      |FROM j ORDER BY event_type""".stripMargin
}
