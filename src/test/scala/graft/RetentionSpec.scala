package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Retention

class RetentionSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(d: Int, u: Long): (Long, Timestamp) =
    (u, Timestamp.valueOf(f"2024-04-$d%02d 10:00:00"))

  test("planted cohort: half return on day 1, a quarter on day 7") {
    // 4 users first seen day 1; users 1,2 return day 2; user 1 day 8
    val events = (Seq(ts(1, 1), ts(1, 2), ts(1, 3), ts(1, 4),
      ts(2, 1), ts(2, 2), ts(8, 1)))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts")
    val out = Retention.retentionMatrix(events).collect()
      .map(r => (r.getAs[Long]("offset"),
        (r.getAs[Long]("n_retained"), r.getAs[Long]("retention_milli")))).toMap
    assert(out(0L) == ((4L, 1000L)), out.toString)
    assert(out(1L) == ((2L, 500L)))
    assert(out(7L) == ((1L, 250L)))
  }

  test("fixture matrix: offset-0 rows are exactly the cohort, bounded offsets") {
    val out = Retention.qRetentionMatrix(spark, sf).cache()
    val day0 = out.filter(col("offset") === 0)
    assert(day0.filter(col("n_retained") =!= col("n_cohort")).count() == 0)
    assert(day0.filter(col("retention_milli") =!= 1000L).count() == 0)
    assert(out.filter(col("offset") < 0 || col("offset") > 13).count() == 0)
    // retention never exceeds the cohort
    assert(out.filter(col("n_retained") > col("n_cohort")).count() == 0)
  }
}
