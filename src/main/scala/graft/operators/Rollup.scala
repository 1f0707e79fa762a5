package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** Incremental aggregate maintenance — the rollup twin of [[Scd.scd2Apply]]:
  * a serving-tier daily aggregate kept up to date by MERGING partial
  * aggregates from each new batch instead of re-scanning history. The
  * reference's gold loader recomputes its daily table from silver every
  * run (/root/reference/airflow/dags/weather_pipeline_dag.py:226-258);
  * at 100 TB the recompute is the bottleneck and mergeability is the fix.
  *
  * The partial state keeps only MERGEABLE measures: count, DECIMAL sum
  * (exact, order/associativity-independent — double sums would drift
  * between the merged and recomputed paths), min, max. The mean is
  * DERIVED at finish time as one double division (the
  * [[Exprs.exactAvg]] discipline), never stored — stored averages don't
  * merge. Distinct counts deliberately stay out of the mergeable state:
  * they don't merge exactly; the scale answer is an HLL sketch column
  * (`hll_sketch_agg` partials unioned at merge — `Scale.qSketchStats`'s
  * territory), the exact answer is a recompute.
  *
  * Merge handles LATE data: a batch may carry rows for any (event_type,
  * date) group, not just new dates — group collision is resolved by
  * re-aggregating the two partials, so out-of-order arrival costs one
  * shuffle of partial-sized (not event-sized) data.
  */
object Rollup {

  private val keys: Seq[Column] =
    Seq(col("event_type"), col("year"), col("month"), col("day"))

  /** Mergeable per-(event_type, day) partial from raw events. */
  def partial(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"), year(col("ts")).as("year"),
        month(col("ts")).as("month"), dayofmonth(col("ts")).as("day"),
        col("value"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("record_count"),
        sum(Exprs.dec2(col("value"))).as("sum_dec"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Merge two partial states: one shuffle of partial-sized data. The
    * decimal sums re-sum exactly (wider precision, same value), so the
    * merged state is bit-identical to a from-scratch partial. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(keys: _*)
      .agg(
        sum(col("record_count")).as("record_count"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Finish: derive the serving columns; the mean is one double division
    * of exact state, identical for merged and recomputed paths. */
  def finish(p: DataFrame): DataFrame =
    p.select(
      col("event_type"), col("year"), col("month"), col("day"),
      col("record_count"),
      col("sum_dec").cast("double").as("sum_value"),
      (col("sum_dec").cast("double") / col("record_count")).as("avg_value"),
      col("min_value"), col("max_value"))

  /** Query instance: the existing rollup covers the id-hash-bucket 0-79
    * slice of events, the "late batch" is the 80-99 remainder (every
    * group collides — the hard merge case, unlike a date split where
    * merge degenerates to append). The merged result must equal the
    * from-scratch rollup over all events, which is what the oracle
    * recomputes. */
  def qIncrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bucket = pmod(graft.functions.TextFns.md5u56(col("user_id").cast("string")),
      lit(100L))
    val existing = partial(ev.filter(bucket < 80))
    val late = partial(ev.filter(bucket >= 80))
    finish(merge(existing, late))
      .orderBy(asc_nulls_first("event_type"), col("year"), col("month"),
        col("day"))
  }

  def oIncrementalRollup: String =
    """SELECT event_type,
      |  CAST(year(ts) AS INTEGER) AS year,
      |  CAST(month(ts) AS INTEGER) AS month,
      |  CAST(day(ts) AS INTEGER) AS day,
      |  CAST(count(*) AS BIGINT) AS record_count,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_value,
      |  min(value) AS min_value,
      |  max(value) AS max_value
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1, 2, 3, 4
      |ORDER BY event_type NULLS FIRST, year, month, day""".stripMargin
}
