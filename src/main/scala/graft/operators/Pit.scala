package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Point-in-time (PIT) join: each fact row looks up the SCD2 dimension
  * version whose [valid_from, valid_to) interval contains the fact
  * timestamp — "the customer's priority AS OF ship date". The naive
  * formulation is an inequality join (key = key AND from ≤ ts < to),
  * which Spark can only plan as a broadcast-nested-loop or a range
  * join; this one never writes the inequality: version-start rows and
  * fact rows UNION into one stream, one shuffle on the key sorts them
  * by (ts, dim-before-fact, version), and a running `last(ignoreNulls)`
  * hands every fact the latest version at-or-before it — linear, one
  * exchange, the [[AsOf]] union-ordering trick specialized to
  * dimension semantics.
  *
  * Zero-length versions (two attribute changes at the same instant
  * produce a version with valid_from = valid_to) are handled by the
  * (ts, version) sort: the superseding version sorts after its
  * zero-length predecessor at the shared instant, so facts at that
  * instant see the survivor — exactly the row the interval predicate
  * `from ≤ ts < to` matches (a zero-length interval contains nothing).
  */
object Pit {

  /** Facts: one row per shipment — lineitem keyed back to the ordering
    * customer. */
  private def facts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("o_custkey").as("custkey"), col("l_shipdate"))

  /** PIT join of facts (custkey, ts) against an SCD2 history. Facts
    * before the key's first version drop (inner semantics). */
  def pitJoin(history: DataFrame, factRows: DataFrame): DataFrame = {
    val dimLeg = history.select(col("o_custkey").as("custkey"),
      col("valid_from").as("pts"), lit(0).as("is_fact"),
      col("version"), col("priority"),
      lit(null).cast("long").as("l_orderkey"),
      lit(null).cast("int").as("l_linenumber"))
    val factLeg = factRows.select(col("custkey"),
      col("l_shipdate").as("pts"), lit(1).as("is_fact"),
      lit(null).cast("long").as("version"),
      lit(null).cast("string").as("priority"),
      col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("pts"), col("is_fact"), col("version"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dimLeg.unionByName(factLeg)
      .withColumn("v", last(col("version"), ignoreNulls = true).over(w))
      .withColumn("prio", last(col("priority"), ignoreNulls = true).over(w))
      .filter(col("is_fact") === 1 && col("v").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
        col("pts").as("ship_ts"), col("v").as("version"),
        col("prio").as("priority"))
  }

  def qPitJoin(spark: SparkSession, dir: String): DataFrame =
    pitJoin(Scd.scd2Build(Tables.orders(spark, dir)), facts(spark, dir))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Oracle: the SCD2 build CTEs + the explicit interval join. */
  def oPitJoin: String =
    """WITH ch AS (
      |  SELECT o_custkey, o_orderpriority AS priority,
      |         o_orderdate AS ts, o_orderkey AS tie,
      |         lag(o_orderpriority) OVER w AS prev
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |c AS (SELECT * FROM ch WHERE prev IS NULL OR prev <> priority),
      |v AS (
      |  SELECT o_custkey, CAST(row_number() OVER w AS BIGINT) AS version,
      |         priority, ts AS valid_from, lead(ts) OVER w AS valid_to
      |  FROM c
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, tie)),
      |f AS (
      |  SELECT l_orderkey, l_linenumber, o_custkey AS custkey,
      |         l_shipdate AS ship_ts
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ship_ts,
      |       v.version, v.priority
      |FROM f JOIN v ON v.o_custkey = f.custkey
      |  AND v.valid_from <= f.ship_ts
      |  AND (v.valid_to IS NULL OR f.ship_ts < v.valid_to)
      |ORDER BY f.l_orderkey, f.l_linenumber""".stripMargin
}
