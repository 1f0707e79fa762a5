package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Pins the two properties the 100 TB story rests on: both sketches
  * merge (shard independently, fold tiny artifacts) and the count-min
  * estimate never undercounts. */
class SketchesSpec extends SparkSpecBase {

  test("KMV: merged half-corpus signatures equal the whole-corpus signature") {
    val ev = Tables.events(spark, sf)
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    val whole = Sketches.kmvSig(ev, "event_type", "user_id")
      .select("event_type", "h")
    val merged = Sketches.kmvMerge(
      Sketches.kmvSig(a, "event_type", "user_id"),
      Sketches.kmvSig(b, "event_type", "user_id"), "event_type")
      .select("event_type", "h")
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("KMV estimate: exact below K, within 40% of exact above K") {
    val rows = Sketches.kmvDistinct(Tables.events(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kept, est, exact) = (r.getAs[Long]("k_kept"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      if (kept < Sketches.K) assert(est == exact, s"${r.getString(0)}: $est != $exact")
      else assert(math.abs(est - exact) * 100 <= 40 * exact,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("histogram sketch: estimates within one bucket width ABOVE the exact quantile") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
    val est = Sketches.histQuantiles(ev).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val ranked = ev.select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .cache()
    def exactP(p: Double): Map[String, Double] =
      ranked.filter(col("rn") === ceil(lit(p) * col("n")))
        .groupBy(col("event_type")).agg(max(col("value")).as("v"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val spans = Sketches.histRanges(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("span")).toMap
    val (e50, e99) = (exactP(0.5), exactP(0.99))
    est.foreach { case (t, (p50, p99)) =>
      val bw = spans(t) / Sketches.HB + 1e-9
      assert(p50 >= e50(t) - 1e-9 && p50 - e50(t) <= bw,
        s"$t p50 est $p50 vs exact ${e50(t)} (bucket width $bw)")
      assert(p99 >= e99(t) - 1e-9 && p99 - e99(t) <= bw,
        s"$t p99 est $p99 vs exact ${e99(t)}")
    }
    ranked.unpersist()
  }

  test("histogram sketch grids merge cell-wise under shared ranges") {
    val ev = Tables.events(spark, sf)
    val rng = Sketches.histRanges(ev)
    val whole = Sketches.histCells(ev, rng)
    val summed = Sketches.histCells(ev.filter(col("event_id") % 2 === 0), rng)
      .union(Sketches.histCells(ev.filter(col("event_id") % 2 === 1), rng))
      .groupBy(col("event_type"), col("bucket")).agg(sum(col("c")).as("c"))
    assert(whole.exceptAll(summed).isEmpty && summed.exceptAll(whole).isEmpty)
  }

  test("streaming KMV state equals the batch sketch across an arbitrary batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val (h1, h2) = all.splitAt(all.length / 2)
    val src = MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingOps
      .kmvDistinctStream(src.toDF.toDF("event_type", "user_id"))
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_stream_out").start()
    src.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
    src.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    // freshest row per type = max k_kept + min kth (monotone state)
    val finals = spark.table("kmv_stream_out")
      .groupBy(col("event_type"))
      .agg(max(col("k_kept")).as("k"), min(col("kth_hash")).as("kth"))
      .collect().map { r =>
        val (k, kth) = (r.getLong(1), r.getLong(2))
        val est = if (k < Sketches.K) k
                  else ((Sketches.K - 1).toLong * Sketches.M) / kth
        r.getString(0) -> est
      }.toMap
    val batch = Sketches.kmvDistinct(Tables.events(spark, sf)).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    assert(finals == batch,
      s"streaming KMV diverges from batch sketch: $finals vs $batch")
  }

  test("rolling-distinct exact leg: interval deltas ≡ the range-join reference") {
    import spark.implicits._
    // r17 optimization gate: the exact audit column is now an interval-
    // delta prefix sum instead of a ×RollDays range-join fan-out. Drive
    // the full operator over an adversarial appearance pattern — runs
    // that touch (gap exactly RollDays), runs that merge (gap
    // RollDays−1), single-day runs, a user active every day, and users
    // shared across event types — and compare exact_distinct against
    // the naive range-join count computed inline.
    val day0 = java.sql.Date.valueOf("2024-01-01").toLocalDate
    def ts(d: Int, u: Long) = java.sql.Timestamp.valueOf(
      day0.plusDays(d).atTime(((u % 24)).toInt, 0))
    val rows = Seq.newBuilder[(Long, String, java.sql.Timestamp, Double)]
    var id = 0L
    for (et <- Seq("click", "view")) {
      // u1: single-day runs with gap exactly RollDays (intervals touch)
      for (d <- Seq(0, 7, 14)) { rows += ((1L, et, ts(d, 1), 1.0)); id += 1 }
      // u2: gap RollDays−1 (runs merge into one covered interval)
      for (d <- Seq(0, 6, 12)) { rows += ((2L, et, ts(d, 2), 1.0)) }
      // u3: active every day 0..20
      for (d <- 0 to 20) { rows += ((3L, et, ts(d, 3), 1.0)) }
      // u4: one appearance mid-range
      rows += ((4L, et, ts(10, 4), 1.0))
      // u5: two appearances same day (dedup inside dh) + far tail
      rows += ((5L, et, ts(3, 5), 1.0)); rows += ((5L, et, ts(3, 6), 1.0))
      rows += ((5L, et, ts(19, 5), 1.0))
    }
    val ev = rows.result().toDF("user_id", "event_type", "ts", "value")
    val got = Sketches.kmvRollingDistinct(ev)
      .select($"event_type", $"day", $"exact_distinct")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
    // naive reference: distinct hashes whose appearance day falls in
    // [day − RollDays + 1, day], per (event_type, observed day)
    val dh = ev.select($"event_type", to_date($"ts").as("day"),
      graft.functions.TextFns.md5u56($"user_id".cast("string")).as("h")).distinct()
    val days = dh.select($"event_type", $"day").distinct()
    val ref = days.as("d").join(dh.as("s"),
        $"s.event_type" === $"d.event_type" &&
          $"s.day" >= date_sub($"d.day", Sketches.RollDays - 1) &&
          $"s.day" <= $"d.day")
      .groupBy($"d.event_type".as("event_type"), $"d.day".as("day"))
      .agg(countDistinct($"s.h").as("exact_distinct"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(got == ref, s"delta form diverged:\n got=$got\n ref=$ref")
  }

  test("CMS: never undercounts, and half-corpus grids sum to the whole grid") {
    val docs = Tables.documents(spark, sf)
    val top = Sketches.cmsTopTerms(docs).collect()
    assert(top.length == 20)
    top.foreach(r => assert(r.getAs[Long]("overest") >= 0L, r.toString))

    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val whole = Sketches.cmsCells(counts(docs))
    val aCells = Sketches.cmsCells(counts(docs.filter(col("doc_id") % 2 === 0)))
    val bCells = Sketches.cmsCells(counts(docs.filter(col("doc_id") % 2 === 1)))
    val summed = aCells.union(bCells)
      .groupBy(col("i"), col("bucket")).agg(sum(col("cell")).as("cell"))
    assert(whole.exceptAll(summed).isEmpty && summed.exceptAll(whole).isEmpty)
  }
}
