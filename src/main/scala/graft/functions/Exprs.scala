package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-expression builders mirroring the reference's derived-column
  * semantics (silver_processor.py:203-264): pure Catalyst expressions,
  * never UDFs, so they stay inside whole-stage codegen.
  */
object Exprs {

  /** Completeness score: start at 100, −10 per null among the optional
    * columns; floor is implied by the column count
    * (silver_processor.py:203-220). */
  def qualityScore(optional: Seq[Column]): Column =
    optional.foldLeft(lit(100)) { (acc, c) =>
      when(c.isNull, acc - 10).otherwise(acc)
    }

  /** Spark dayofweek is Sun=1..Sat=7; weekend = Sun|Sat
    * (silver_processor.py:242). */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** Daylight flag. The reference compares against per-row sunrise/sunset
    * columns (silver_processor.py:245-251); the fixture stream has no
    * such columns, so the hour-band overload stands in. */
  def isDay(hourOfDay: Column, start: Int = 7, end: Int = 18): Column =
    hourOfDay.between(start, end)
  def isDay(ts: Column, sunrise: Column, sunset: Column): Column =
    ts >= sunrise && ts <= sunset

  /** Heat-index formula temperature + 0.5555*(humidity/100 − 1)
    * (silver_processor.py:255-264). Plain double arithmetic — per-row,
    * order-independent, bit-reproducible across engines. */
  def heatIndex(temp: Column, humidity: Column): Column =
    temp + lit(0.5555) * (humidity / lit(100.0) - lit(1.0))

  def tempRange(tempMax: Column, tempMin: Column): Column = tempMax - tempMin

  /** Exact decimal view of a ≤2-decimal-digit double measure, for
    * order-independent SUM/AVG (see operators.Tpch scaladoc). */
  def dec2(c: Column): Column = c.cast(DecimalType(14, 2))

  /** Order-independent mean of a ≤2-decimal measure: exact decimal sum,
    * then one double division — bit-identical in Spark and DuckDB. */
  def exactAvg(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** Wider variant for re-averaging already-averaged doubles (weekly
    * rollup of daily means, sql/schema.sql:226-239). */
  def exactAvgWide(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast("double") / count(c)
}
