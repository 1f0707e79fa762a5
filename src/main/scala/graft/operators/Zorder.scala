package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton-curve) layout — the multi-dimensional clustering
  * technique lakehouses use when a table is probed on TWO independent
  * columns: interleave the bits of both dimensions and sort the layout
  * by the interleaved value, so rows close in EITHER dimension land in
  * few files and parquet row-group min/max stats prune on both — a
  * single-column sort gives perfect pruning on one dimension and none
  * on the other.
  *
  * The z-value is pure integer bit arithmetic (32 codegen'd shift/mask
  * terms, no UDF, no libm); the mapping is hash-gated against an
  * identical DuckDB bit expression (`zorder_map` in SparkEntry). The
  * LAYOUT effect (a second-dimension predicate prunes files a 1-D sort
  * cannot) is spec-measured in ScaleSpec via
  * [[Scale.writeZOrderLayout]], which range-buckets real-valued
  * dimensions before the same interleave — this module carries the
  * integer-grid mapping and its gate; Scale carries the writer.
  *
  * Scale shape: computing z is map-only; writing the layout is ONE
  * range-partitioned sort (the same cost as any ordered write). At
  * 100 TB this is a settle-once layout choice exactly like bucketing —
  * paid at ingest, repaid by every two-dimensional probe. */
object Zorder {

  /** Bits per dimension; 2·Bits ≤ 62 keeps the z-value in a long. */
  val Bits = 16

  /** Interleave the low [[Bits]] bits of two non-negative longs:
    * x occupies even bit positions, y odd. Inputs outside [0, 2^Bits)
    * must be bucketized first — [[zBucket]] — or high bits are
    * silently ignored (the curve needs a bounded grid). */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The matching SQL fragment for the DuckDB twin. */
  def zValueSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Clamp a non-negative dimension into the curve's grid. */
  def zBucket(c: Column): Column = pmod(c, lit(1L << Bits))

  /** The gated mapping: every event's (user bucket, day bucket) cell
    * and its z-value. epoch day = days since 1970-01-01 in UTC — both
    * engines derive it the same way from the timestamp's date. */
  def qZorderMap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(col("event_id"),
      zBucket(col("user_id")).as("zx"),
      zBucket(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long")).as("zy"))
      .withColumn("zval", zValue(col("zx"), col("zy")))
      .orderBy(col("event_id"))
  }

  def oZorderMap: String =
    s"""WITH b AS (
       |  SELECT event_id,
       |    user_id % ${1L << Bits} AS zx,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
       |      % ${1L << Bits} AS zy
       |  FROM events)
       |SELECT event_id, zx, zy,
       |  CAST(${zValueSql("zx", "zy")} AS BIGINT) AS zval
       |FROM b ORDER BY event_id""".stripMargin

}
