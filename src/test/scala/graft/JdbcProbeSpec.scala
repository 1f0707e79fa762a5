package graft

import org.apache.spark.sql.functions._

import graft.sinks.JdbcSink

/** Bounded idempotent-append probe: the remote key scan must be limited
  * to the incoming batch's key range (predicate pushed into the remote
  * SQL) instead of reading every historical key. */
class JdbcProbeSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshUrl() = s"jdbc:derby:memory:probe${System.nanoTime()};create=true"

  private def mkTable(url: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      """CREATE TABLE gold_days (
        |  "event_type" VARCHAR(32), "day" INT, "total" DOUBLE)""".stripMargin)
    finally c.close()
  }

  test("probePredicate renders range bounds with portable literals") {
    val df = Seq(
      ("a'b", 3, java.sql.Timestamp.valueOf("2024-01-02 10:00:00")),
      ("zz", 7, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")))
      .toDF("name", "day", "ts")
    val pred = JdbcSink.probePredicate(df, Seq("name", "day", "ts"), k => s""""$k"""")
    // string key "name" is deliberately unbounded (remote collation could
    // make a Spark-derived range empty); numeric + timestamp keys bind
    assert(pred.contains(
      """"day" BETWEEN 3 AND 7 AND """ +
        """"ts" BETWEEN {ts '2024-01-02 10:00:00.0'} AND {ts '2024-01-05 10:00:00.0'}"""),
      pred.toString)
  }

  test("string keys are excluded from the probe; remaining keys still bound") {
    val df = Seq(("B", 3), ("a", 7)).toDF("name", "day")
    val pred = JdbcSink.probePredicate(df, Seq("name", "day"), k => s""""$k"""")
    assert(pred.contains(""""day" BETWEEN 3 AND 7"""), pred.toString)
    assert(!pred.get.contains("name"), "collation-unsafe string key must not bind")
    // all keys string → no safe bounds at all → unbounded probe
    val onlyStr = Seq(("B", "x"), ("a", "y")).toDF("name", "other")
    assert(JdbcSink.probePredicate(onlyStr, Seq("name", "other"), identity).isEmpty)
  }

  test("empty batch or null keys fall back to the unbounded probe") {
    val empty = Seq.empty[(String, Int)].toDF("name", "day")
    assert(JdbcSink.probePredicate(empty, Seq("name", "day"), identity).isEmpty)
    val withNull = Seq(("a", Some(1)), ("b", None)).toDF("name", "day")
      .filter(col("day").isNull) // all-null key column → no safe bounds
    assert(JdbcSink.probePredicate(withNull, Seq("name", "day"), identity).isEmpty)
  }

  test("bounded append dedups inside the window and loads only new keys") {
    val url = freshUrl(); mkTable(url)
    val batch1 = Seq(("click", 1, 10.0), ("click", 2, 20.0), ("view", 2, 5.0))
      .toDF("event_type", "day", "total")
    assert(JdbcSink.idempotentAppend(spark, batch1, url, "gold_days",
      Seq("event_type", "day")) == 3)
    // overlapping window: day 2 replays, day 3 is new
    val batch2 = Seq(("click", 2, 99.0), ("view", 2, 99.0), ("click", 3, 30.0))
      .toDF("event_type", "day", "total")
    assert(JdbcSink.idempotentAppend(spark, batch2, url, "gold_days",
      Seq("event_type", "day")) == 1, "only the day-3 row is new")
    val stored = JdbcSink.readTable(spark, url, "gold_days")
    assert(stored.count() == 4)
    // replayed keys kept their original values (no overwrite)
    assert(stored.filter(col("day") === 2 && col("total") === 99.0).count() == 0)
  }

  test("bounded probe reads only the batch window, not historical keys") {
    val url = freshUrl(); mkTable(url)
    // seed "history": days 1..50
    val history = (1 to 50).map(d => ("click", d, d.toDouble)).toDF("event_type", "day", "total")
    JdbcSink.idempotentAppend(spark, history, url, "gold_days", Seq("event_type", "day"))
    // a day-49..51 batch: the probe subquery must see only 2 existing keys
    val batch = Seq(("click", 49, 0.0), ("click", 51, 0.0)).toDF("event_type", "day", "total")
    val pred = JdbcSink.probePredicate(batch, Seq("event_type", "day"), k => s""""$k"""")
    val probed = spark.read.jdbc(url,
      s"""(SELECT "event_type", "day" FROM gold_days WHERE ${pred.get}) probe""",
      new java.util.Properties)
    assert(probed.count() == 2, "window probe sees days 49-50 only")
    assert(JdbcSink.idempotentAppend(spark, batch, url, "gold_days",
      Seq("event_type", "day")) == 1)
    assert(JdbcSink.readTable(spark, url, "gold_days").count() == 51)
  }
}
