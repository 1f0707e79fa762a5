package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * shape): a rule set — completeness, uniqueness, accepted values,
  * bounds, volume SLAs — evaluated over a table in ONE aggregation
  * pass, emitting a long-format report row per rule.
  *
  * This generalizes the reference DAG's ad-hoc quality probes (dup
  * scan / null scan / count assertions, `weather_pipeline_dag.py`
  * quality task) into a composable contract object: rules are (name,
  * metric aggregate, pass predicate) triples; the evaluator folds ALL
  * metric aggregates into a single `agg` — one scan, one reduction,
  * no matter how many rules — then explodes the 1-row result into the
  * report. At 100 TB that single-pass property is the difference
  * between a nightly contract check and N full scans; every metric
  * here is a partial-aggregable count/min/max, so the shuffle is one
  * row per partition.
  *
  * Determinism: metrics are counts, count ratios (exact integer sums
  * divided once — one exactly-rounded IEEE op), extrema, or epoch
  * micros — all bit-reproducible across engines, so the report
  * carries a full DuckDB hash gate including the boolean verdicts.
  */
object Expectations {

  /** One expectation: `metric` must be an aggregate expression; `pass`
    * maps the metric column to a boolean verdict. */
  final case class Rule(name: String, metric: Column, pass: Column => Column)

  /** Evaluate every rule in one aggregation pass over `df`. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.map(r => r.metric.cast("double").as(s"m_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { r =>
      val m = col(s"m_${r.name}")
      struct(lit(r.name).as("rule"), m.as("metric"), r.pass(m).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
      .orderBy("rule")
  }

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** The canonical contract for the `events` stream. `volume_min_rows`
    * is a deliberate fail at test scale (a 1M-row daily SLA): a
    * contract engine that has never reported a failure is untested. */
  def eventRules: Seq[Rule] = Seq(
    Rule("completeness_value",
      count(col("value")) / count(lit(1)), _ >= 0.99),
    Rule("uniqueness_event_id",
      countDistinct(col("event_id")) / count(lit(1)), _ === 1.0),
    Rule("accepted_event_types",
      sum(when(!col("event_type").isin(EventTypes: _*), 1).otherwise(0)) /
        count(lit(1)), _ === 0.0),
    Rule("value_upper_bound", max(col("value")), _ <= 500.0),
    Rule("value_lower_bound", min(col("value")), _ >= 0.0),
    Rule("ts_freshness_us", unix_micros(max(col("ts"))),
      _ <= lit(1706745600000000L).cast("double")), // 2024-02-01 UTC
    Rule("volume_min_rows", count(lit(1)), _ >= 1000000L))

  def qExpectations(spark: SparkSession, dir: String): DataFrame =
    report(Tables.events(spark, dir), eventRules)

  val oExpectations: String = {
    val types = EventTypes.map(t => s"'$t'").mkString(", ")
    """WITH m AS (
      |  SELECT
      |    CAST(count(value) AS DOUBLE) / count(*) AS completeness_value,
      |    CAST(count(DISTINCT event_id) AS DOUBLE) / count(*) AS uniqueness_event_id,
      |    CAST(sum(CASE WHEN event_type NOT IN (TYPES) THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*) AS accepted_event_types,
      |    max(value) AS value_upper_bound,
      |    min(value) AS value_lower_bound,
      |    CAST(epoch_us(max(ts)) AS DOUBLE) AS ts_freshness_us,
      |    CAST(count(*) AS DOUBLE) AS volume_min_rows
      |  FROM events)
      |SELECT * FROM (
      |  SELECT 'completeness_value' AS rule, completeness_value AS metric,
      |    completeness_value >= 0.99 AS passed FROM m
      |  UNION ALL
      |  SELECT 'uniqueness_event_id', uniqueness_event_id,
      |    uniqueness_event_id = 1.0 FROM m
      |  UNION ALL
      |  SELECT 'accepted_event_types', accepted_event_types,
      |    accepted_event_types = 0.0 FROM m
      |  UNION ALL
      |  SELECT 'value_upper_bound', value_upper_bound,
      |    value_upper_bound <= 500.0 FROM m
      |  UNION ALL
      |  SELECT 'value_lower_bound', value_lower_bound,
      |    value_lower_bound >= 0.0 FROM m
      |  UNION ALL
      |  SELECT 'ts_freshness_us', ts_freshness_us,
      |    ts_freshness_us <= 1706745600000000.0 FROM m
      |  UNION ALL
      |  SELECT 'volume_min_rows', volume_min_rows,
      |    volume_min_rows >= 1000000.0 FROM m)
      |ORDER BY rule""".stripMargin.replace("TYPES", types)
  }
}
