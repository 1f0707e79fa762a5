package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Lateness

class LatenessSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("planted out-of-order arrivals land in the right lateness buckets") {
    // arrival order (event_id): t0, t0+2h, then three stragglers
    val events = Seq(
      (1L, ts("2024-06-01 10:00:00")),  // on time
      (2L, ts("2024-06-01 12:00:00")),  // on time, raises hwm
      (3L, ts("2024-06-01 11:59:30")),  // 30 s late
      (4L, ts("2024-06-01 11:30:00")),  // 30 min late
      (5L, ts("2024-06-01 09:00:00")))  // 3 h late
      .toDF("event_id", "ts")
    val out = Lateness.latenessProfile(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a_on_time")._1 == 2)
    assert(out("b_1min") == ((1L, 30L)))
    assert(out("c_1hour") == ((1L, 1800L)))
    assert(out("e_later") == ((1L, 10800L)))
    assert(!out.contains("d_2hours"))
  }

  test("fixture feed is event-time ordered: everything on time (measured)") {
    val out = Lateness.qLatenessProfile(spark, sf).collect()
    assert(out.length == 1 && out.head.getString(0) == "a_on_time",
      "the fixture generator emits in event-time order — if this fails, " +
        "the generator changed and the 2h watermark assumption needs review")
    assert(out.head.getLong(3) == 1000L)
  }
}
