package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Robust statistics per group — the outlier-resistant summary pair a
  * data-quality pipeline reads next to means: trimmed means (drop the
  * top/bottom 5% by rank before averaging) and the median absolute
  * deviation (the robust spread measure). Money enters as exact
  * DECIMAL cents cast to long; trim boundaries and both medians are
  * pure integer rank selection; the only float is one exactly-rounded
  * IEEE division at the edge.
  *
  * Scale shape (100 TB): every rank rides [[Scale.groupRanks]] — the
  * [[Scale.hotGroups]] dial between grouped distributed prefix sums
  * and plain windows — so the 3-value `l_returnflag` key never
  * degenerates to three giant sort tasks; the rest is hash aggregates
  * and a ≤|groups|-row broadcast join.
  */
object Robust {

  /** Trim fraction denominator: drop ⌊n/20⌋ = 5% from each tail. */
  val TrimDen = 20

  /** Per-flag 5%-trimmed mean of extended price (exact cents). */
  def trimmedMean(lineitem: DataFrame,
      hotGroupsOverride: Option[Boolean] = None): DataFrame = {
    val base = lineitem.select(col("l_returnflag"),
      (col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
        .as("cents"),
      col("l_orderkey"), col("l_linenumber"))
    val ranked = Scale.groupRanks(base, Seq("l_returnflag"),
      Seq(col("cents"), col("l_orderkey"), col("l_linenumber")),
      "r", totalOut = Some("n"), hotGroupsOverride = hotGroupsOverride)
    ranked
      .filter(col("r") > expr(s"n div $TrimDen") &&
        col("r") <= col("n") - expr(s"n div $TrimDen"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("cents")).cast("long").as("sum_cents"))
      .withColumn("trimmed_mean_cents", expr("sum_cents div n_kept"))
      .select(col("l_returnflag"), col("n_kept"), col("sum_cents"),
        col("trimmed_mean_cents"))
  }

  def qTrimmedMean(spark: SparkSession, dir: String): DataFrame =
    trimmedMean(Tables.lineitem(spark, dir)).orderBy(col("l_returnflag"))

  def oTrimmedMean: String =
    s"""WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS cents,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      |  FROM b)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
      |    AS trimmed_mean_cents
      |FROM r
      |WHERE r > n // $TrimDen AND r <= n - n // $TrimDen
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Per-flag median absolute deviation: med = lower median of cents,
    * MAD = lower median of |cents − med| — two rank-selection passes,
    * all integers.
    *
    * The pass-1 ranked frame is cached and BOTH downstream consumers
    * (the median extraction and the deviation table) read it: without
    * the barrier, `dev` re-derived the base projection — a second full
    * lineitem scan + decimal cast — and the r1 rank work fed only the
    * 3-row median (measured 4.6 s; reusing the materialized ranks cuts
    * the source to one scan + two rank passes, the honest floor for a
    * data-dependent second ordering). */
  def madByFlag(lineitem: DataFrame,
      hotGroupsOverride: Option[Boolean] = None): DataFrame = {
    val base = lineitem.select(col("l_returnflag"),
      (col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
        .as("cents"),
      col("l_orderkey"), col("l_linenumber"))
    val r1 = Scale.groupRanks(base, Seq("l_returnflag"),
      Seq(col("cents"), col("l_orderkey"), col("l_linenumber")),
      "r", totalOut = Some("n"), hotGroupsOverride = hotGroupsOverride)
    Dedup.withCached(r1) { ranked =>
      val med = ranked.filter(col("r") * 2 === col("n") + (col("n") % 2))
        .select(col("l_returnflag"), col("cents").as("med_cents"))
      val dev = ranked.join(broadcast(med), Seq("l_returnflag"))
        .withColumn("dev", abs(col("cents") - col("med_cents")))
        .select(col("l_returnflag"), col("dev"), col("med_cents"),
          col("l_orderkey"), col("l_linenumber"))
      val r2 = Scale.groupRanks(dev, Seq("l_returnflag"),
        Seq(col("dev"), col("l_orderkey"), col("l_linenumber")),
        "r", totalOut = Some("n"), hotGroupsOverride = hotGroupsOverride)
      r2.filter(col("r") * 2 === col("n") + (col("n") % 2))
        .select(col("l_returnflag"), col("med_cents"),
          col("dev").as("mad_cents"), col("n"))
    }
  }

  def qMadByFlag(spark: SparkSession, dir: String): DataFrame =
    madByFlag(Tables.lineitem(spark, dir)).orderBy(col("l_returnflag"))

  def oMadByFlag: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS cents,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |r1 AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      |  FROM b),
      |med AS (
      |  SELECT l_returnflag, cents AS med_cents
      |  FROM r1 WHERE r * 2 = n + (n % 2)),
      |dev AS (
      |  SELECT b.l_returnflag, abs(b.cents - m.med_cents) AS dev,
      |    m.med_cents, b.l_orderkey, b.l_linenumber
      |  FROM b JOIN med m ON b.l_returnflag = m.l_returnflag),
      |r2 AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY dev, l_orderkey, l_linenumber) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      |  FROM dev)
      |SELECT l_returnflag, med_cents, dev AS mad_cents, n
      |FROM r2 WHERE r * 2 = n + (n % 2)
      |ORDER BY l_returnflag""".stripMargin
}
