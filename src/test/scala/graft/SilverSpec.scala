package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.Exprs
import graft.operators.{Serving, Silver}

/** Ports of the reference's semantic micro-specs
  * (tests/test_pipeline.py:163-233,297-320) onto DataFrames. */
class SilverSpec extends SparkSpecBase {
  import spark.implicits._

  test("temperature-range filter keeps -50, drops 70 (test_pipeline.py:300-309)") {
    val df = Seq(20.0, 15.0, -50.0, 70.0, 10.0).toDF("temperature")
    val kept = df.filter($"temperature".between(-100.0, 60.0)).collect().map(_.getDouble(0))
    assert(kept.toSet == Set(20.0, 15.0, -50.0, 10.0))
  }

  test("null rejection drops rows with null critical column (test_pipeline.py:311-320)") {
    val df = Seq(Some("Paris"), Some("London"), None, Some("Tokyo")).toDF("city")
    assert(df.filter($"city".isNotNull).count() == 3)
    val nullPct = 1.0 * df.filter($"city".isNull).count() / df.count()
    assert(nullPct <= 0.25 + 1e-9)
  }

  test("quality score: 100 base, -10 per null, floor 50 with 5 optional cols (silver_processor.py:203-220)") {
    val df = Seq(
      (Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(1.0)),
      (None, Some(1.0), Some(1.0), Some(1.0), Some(1.0)),
      (Option.empty[Double], Option.empty[Double], Option.empty[Double],
        Option.empty[Double], Option.empty[Double])
    ).toDF("a", "b", "c", "d", "e")
    val scores = df.select(Exprs.qualityScore(Seq($"a", $"b", $"c", $"d", $"e")).as("s"))
      .collect().map(_.getInt(0))
    assert(scores.toSeq == Seq(100, 90, 50))
  }

  test("dedup by key is deterministic and idempotent (test_pipeline.py:225-233)") {
    val base = Seq((1L, "2024-01-01T00:00:00", "first"), (2L, "2024-01-01T01:00:00", "x"))
      .toDF("id", "ts", "tag")
    val withDup = base.union(Seq((3L, "2024-01-01T00:00:00", "dup-copy")).toDF("id", "ts", "tag"))
      .withColumn("key", lit("Paris"))
    val deduped = Silver.dedupFirstByKey(withDup, Seq("key", "ts"), col("id"))
    assert(deduped.count() == 2)
    // first-by-id wins, not the later copy
    assert(deduped.filter($"ts" === "2024-01-01T00:00:00").select("tag").head().getString(0) == "first")
    // idempotent
    assert(Silver.dedupFirstByKey(deduped, Seq("key", "ts"), col("id")).count() == 2)
  }

  test("heat index formula (silver_processor.py:255-264)") {
    val df = Seq((20.0, 100.0), (20.0, 50.0)).toDF("t", "h")
    val got = df.select(Exprs.heatIndex($"t", $"h")).collect().map(_.getDouble(0))
    assert(got(0) == 20.0)                       // humidity 100 → unchanged
    assert(math.abs(got(1) - (20.0 + 0.5555 * (-0.5))) < 1e-12)
  }

  test("is_weekend follows Spark dayofweek Sun=1 convention (silver_processor.py:242)") {
    val df = Seq("2024-01-06", "2024-01-07", "2024-01-08") // Sat, Sun, Mon
      .toDF("d").select(to_timestamp($"d").as("ts"))
    val got = df.select(Exprs.isWeekend($"ts")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, true, false))
  }

  test("is_day via sunrise/sunset column comparison (silver_processor.py:245-251)") {
    val df = Seq(
      ("2024-01-01T12:00:00", "2024-01-01T07:00:00", "2024-01-01T17:00:00"),
      ("2024-01-01T03:00:00", "2024-01-01T07:00:00", "2024-01-01T17:00:00"))
      .toDF("ts", "sr", "ss")
      .select(to_timestamp($"ts").as("ts"), to_timestamp($"sr").as("sr"), to_timestamp($"ss").as("ss"))
    val got = df.select(Exprs.isDay($"ts", $"sr", $"ss")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false))
  }

  test("latestPerKey max_by agrees with window row_number variant") {
    val ev = Tables.events(spark, sf)
    val a = Serving.latestPerKey(ev, Seq("user_id"), struct($"ts", $"event_id"))
      .orderBy("user_id").collect()
    val b = Serving.latestPerKeyWindowed(ev, Seq("user_id"), Seq($"ts".desc, $"event_id".desc))
      .orderBy("user_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("daily agg record counts sum to cleaned row count (consistency property)") {
    val cleaned = Silver.cleanEnriched(spark, sf)
    val daily = Silver.dailyAgg(cleaned)
    val total = daily.agg(sum($"record_count")).head().getLong(0)
    assert(total == cleaned.count())
  }
}
