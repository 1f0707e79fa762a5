package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Join-size estimation — the optimizer-statistics operator: predict
  * |A ⋈ B| from per-side statistics WITHOUT running the join, and score
  * the prediction against the exact answer. Three numbers per join:
  *
  *  - `actual_rows`: the exact equi-join cardinality, computed as
  *    Σ_k a_k·b_k over the two per-key count tables — two aggregates
  *    and a key-table join, never the joined row set itself (the
  *    count-of-counts identity; at 100 TB this is the only affordable
  *    way to even KNOW a join's true size).
  *  - `est_uniform`: the textbook System-R estimate
  *    ⌊rows_a·rows_b / max(ndv_a, ndv_b)⌋ — exact integer arithmetic.
  *  - `est_heavy`: frequency-skew-aware — the top-[[TopH]] left keys
  *    contribute their EXACT a_k·b_k (heavy hitters are where uniform
  *    estimates die), the remainder falls back to the uniform model
  *    over the residual rows/ndv.
  *
  * Everything is BIGINT arithmetic (floor division), so both engines
  * agree bit-for-bit. All frames past the per-key aggregates are
  * #distinct-keys-sized or 1-row control-plane scalars. */
object Planning {

  /** Heavy-hitter budget for the skew-aware estimate. */
  val TopH = 100

  /** 1-row statistics frame for one equi-join. */
  def joinCardinality(left: DataFrame, lk: String, right: DataFrame,
      rk: String, joinName: String, topH: Int = TopH): DataFrame = {
    val a = left.groupBy(col(lk).as("k")).agg(count(lit(1)).as("ca"))
    val b = right.groupBy(col(rk).as("k")).agg(count(lit(1)).as("cb"))
    val sa = a.agg(sum(col("ca")).as("rows_a"), count(lit(1)).as("ndv_a"))
    val sb = b.agg(sum(col("cb")).as("rows_b"), count(lit(1)).as("ndv_b"))
    val actual = a.join(b, Seq("k"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("actual_rows"))
    val heavy = a.orderBy(col("ca").desc, col("k")).limit(topH)
    // (no broadcast hint: the left side of a left-outer can't broadcast;
    // the 100-row frame shuffles for free)
    val heavyStats = heavy.join(b, Seq("k"), "left")
      .agg(
        coalesce(sum(col("ca") * coalesce(col("cb"), lit(0L))), lit(0L))
          .as("heavy_exact"),
        coalesce(sum(col("ca")), lit(0L)).as("heavy_rows_a"),
        count(lit(1)).as("heavy_ndv_a"))
    sa.crossJoin(sb).crossJoin(actual).crossJoin(heavyStats)
      .withColumn("est_uniform",
        expr("(rows_a * rows_b) div greatest(ndv_a, ndv_b)"))
      .withColumn("est_heavy",
        expr("""heavy_exact + CASE WHEN ndv_a > heavy_ndv_a
               |  THEN ((rows_a - heavy_rows_a) * rows_b)
               |       div greatest(ndv_a - heavy_ndv_a, ndv_b)
               |  ELSE 0 END""".stripMargin))
      .withColumn("err_uniform_pct",
        expr("abs(est_uniform - actual_rows) * 100 div actual_rows"))
      .withColumn("err_heavy_pct",
        expr("abs(est_heavy - actual_rows) * 100 div actual_rows"))
      .select(lit(joinName).as("join_name"), col("rows_a"), col("rows_b"),
        col("ndv_a"), col("ndv_b"), col("actual_rows"), col("est_uniform"),
        col("est_heavy"), col("err_uniform_pct"), col("err_heavy_pct"))
  }

  /** Statistics for the two workhorse TPC-H joins. */
  def qJoinCardinality(spark: SparkSession, dir: String): DataFrame =
    joinCardinality(Tables.orders(spark, dir), "o_orderkey",
      Tables.lineitem(spark, dir), "l_orderkey", "orders_lineitem")
      .union(joinCardinality(Tables.customer(spark, dir), "c_custkey",
        Tables.orders(spark, dir), "o_custkey", "customer_orders"))
      .orderBy(col("join_name"))

  private def oneJoinSql(leftT: String, lk: String, rightT: String,
      rk: String, joinName: String): String =
    s"""SELECT '$joinName' AS join_name, rows_a, rows_b, ndv_a, ndv_b,
       |  actual_rows, est_uniform, est_heavy,
       |  abs(est_uniform - actual_rows) * 100 // actual_rows AS err_uniform_pct,
       |  abs(est_heavy - actual_rows) * 100 // actual_rows AS err_heavy_pct
       |FROM (
       |  SELECT rows_a, rows_b, ndv_a, ndv_b, actual_rows,
       |    (rows_a * rows_b) // greatest(ndv_a, ndv_b) AS est_uniform,
       |    heavy_exact + CASE WHEN ndv_a > heavy_ndv_a
       |      THEN ((rows_a - heavy_rows_a) * rows_b)
       |           // greatest(ndv_a - heavy_ndv_a, ndv_b)
       |      ELSE 0 END AS est_heavy
       |  FROM (
       |    WITH a AS (SELECT $lk AS k, count(*) AS ca FROM $leftT GROUP BY 1),
       |    b AS (SELECT $rk AS k, count(*) AS cb FROM $rightT GROUP BY 1),
       |    h AS (SELECT k, ca FROM a ORDER BY ca DESC, k LIMIT $TopH)
       |    SELECT
       |      (SELECT CAST(sum(ca) AS BIGINT) FROM a) AS rows_a,
       |      (SELECT count(*) FROM a) AS ndv_a,
       |      (SELECT CAST(sum(cb) AS BIGINT) FROM b) AS rows_b,
       |      (SELECT count(*) FROM b) AS ndv_b,
       |      (SELECT CAST(COALESCE(sum(ca * cb), 0) AS BIGINT)
       |       FROM a JOIN b USING (k)) AS actual_rows,
       |      (SELECT CAST(COALESCE(sum(h.ca * COALESCE(b.cb, 0)), 0) AS BIGINT)
       |       FROM h LEFT JOIN b USING (k)) AS heavy_exact,
       |      (SELECT CAST(COALESCE(sum(ca), 0) AS BIGINT) FROM h) AS heavy_rows_a,
       |      (SELECT count(*) FROM h) AS heavy_ndv_a))""".stripMargin

  def oJoinCardinality: String =
    s"""${oneJoinSql("orders", "o_orderkey", "lineitem", "l_orderkey", "orders_lineitem")}
       |UNION ALL
       |${oneJoinSql("customer", "c_custkey", "orders", "o_custkey", "customer_orders")}
       |ORDER BY join_name""".stripMargin
}
