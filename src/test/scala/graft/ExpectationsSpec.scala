package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Rule

/** Single-pass expectations engine: verdicts on planted-violation data,
  * the one-aggregation-job guarantee, and the canonical events contract. */
class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  test("violations flip exactly the affected rules") {
    val dirty = Seq(
      (1L, Some(5.0), "view"),
      (2L, None, "view"),        // null value → completeness violation
      (2L, Some(900.0), "bogus") // dup id, out-of-range, bad type
    ).toDF("event_id", "value", "event_type")
    val out = Expectations.report(dirty, Seq(
      Rule("complete_value", count(col("value")) / count(lit(1)), _ >= 0.99),
      Rule("unique_id", countDistinct(col("event_id")) / count(lit(1)), _ === 1.0),
      Rule("max_value", max(col("value")), _ <= 500.0),
      Rule("types", sum(when(!col("event_type").isin("view"), 1).otherwise(0)) /
        count(lit(1)), _ === 0.0)
    )).collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out == Map("complete_value" -> false, "unique_id" -> false,
      "max_value" -> false, "types" -> false))
    val clean = Seq((1L, Some(5.0), "view"), (2L, Some(6.0), "view"))
      .toDF("event_id", "value", "event_type")
    val ok = Expectations.report(clean, Seq(
      Rule("complete_value", count(col("value")) / count(lit(1)), _ >= 0.99),
      Rule("unique_id", countDistinct(col("event_id")) / count(lit(1)), _ === 1.0)
    )).collect()
    assert(ok.forall(_.getBoolean(2)))
  }

  test("all rules evaluate in one aggregation job (no per-rule scans)") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Expectations.report(events, Expectations.eventRules)
      .queryExecution.executedPlan.toString
    // a single scan of the events parquet feeds every metric
    assert("FileScan parquet".r.findAllIn(plan).length +
      "Scan parquet".r.findAllIn(plan).length <= 2, plan)
  }

  test("canonical events contract: data rules pass, the 1M-row SLA fails") {
    val out = Expectations.qExpectations(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out("completeness_value") && out("uniqueness_event_id") &&
      out("accepted_event_types") && out("value_upper_bound") &&
      out("value_lower_bound") && out("ts_freshness_us"))
    assert(!out("volume_min_rows"), "fixture volume must trip the SLA rule")
  }
}
