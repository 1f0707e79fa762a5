package graft

import org.apache.spark.sql.functions._

import graft.operators.Diagnostics

class DiagnosticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("k-anonymity: planted small class is flagged, totals reconcile") {
    val df = Seq(
      ("us", "A"), ("us", "A"), ("us", "A"),
      ("us", "B"), ("us", "B"),
      ("de", "A")).toDF("country", "segment")
    val out = Diagnostics.kAnonymity(df, Seq("country", "segment"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("risky"))).toMap
    assert(out(("us", "A")) == (3L, false))
    assert(out(("us", "B")) == (2L, true))
    assert(out(("de", "A")) == (1L, true))
    assert(out.values.map(_._1).sum == df.count())
  }

  test("l-diversity: homogeneous class flagged even when it clears k") {
    val df = Seq(
      ("us", "cancer"), ("us", "flu"), ("us", "cold"),
      ("de", "flu"), ("de", "flu"), ("de", "flu"), ("de", "flu"))
      .toDF("country", "diagnosis")
    val out = Diagnostics.lDiversity(df, Seq("country"), "diagnosis", l = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("distinct_sensitive"),
          r.getAs[Boolean]("risky"))).toMap
    // de is the homogeneity attack: 4 members (k-safe at k=3) yet one
    // shared sensitive value
    assert(out("de") == (4L, 1L, true))
    assert(out("us") == (3L, 3L, false))
  }

  test("FD check: held dependency reports zero violations, broken one counts rows") {
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "x"),
      (4L, "b", "y"), (5L, "b", "y")).toDF("id", "k", "v")
    val out = Diagnostics.fdCheck(df, Seq("id" -> "k", "k" -> "v"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("determinant_values"), r.getAs[Long]("violating_keys"),
          r.getAs[Long]("violating_rows"))).toMap
    assert(out("id->k") == (5L, 0L, 0L))
    // k='b' maps to {x, y}: one violating key covering its 3 rows
    assert(out("k->v") == (2L, 1L, 3L))
  }

  test("daily dup-rate: planted duplicates counted, clean day reads zero") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-02 10:00:00")
    val df = Seq(
      (ts0, 1L, "view", 1.0), (ts0, 1L, "view", 1.0), // dup pair on day 1
      (ts0, 2L, "view", 1.0),
      (ts1, 1L, "click", 2.0), (ts1, 2L, "click", 2.0))
      .toDF("ts", "user_id", "event_type", "value")
    val out = Diagnostics.dupRateDaily(df).collect()
      .map(r => r.getDate(0).toString ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("dup_rows"),
          r.getAs[Long]("dup_rate_milli"))).toMap
    assert(out("2024-01-01") == (3L, 1L, 333L))
    assert(out("2024-01-02") == (2L, 0L, 0L))
  }

  test("burstiness: metronomic stream reads 0, bursty stream reads high") {
    def ev(day: Int, n: Int, typ: String) = (0 until n).map(_ =>
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), typ))
    // steady: 4/day × 3 days → variance 0 → fano 0
    // bursty: (1, 1, 10): S=12, Q=102, n=3 → (306−144)*1000/(3*12)=4500
    val df = ((1 to 3).flatMap(d => ev(d, 4, "steady")) ++
      ev(1, 1, "bursty") ++ ev(2, 1, "bursty") ++ ev(3, 10, "bursty"))
      .toDF("ts", "event_type")
    val out = Diagnostics.burstiness(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("fano_milli")).toMap
    assert(out("steady") == 0L)
    assert(out("bursty") == 4500L)
  }

  test("user concentration: whale share hand-computed, ceil-k boundary") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // 10 users: one whale with 91 events, nine with 1 → top-1% is
    // k = ceil(10/100) = 1 user holding 910‰ of 100 events
    val df = ((0 until 91).map(_ => (ts, 1L)) ++
      (2L to 10L).map(u => (ts, u))).toDF("ts", "user_id")
    val r = Diagnostics.userConcentration(df, pct = 1).head()
    assert(r.getAs[Long]("users") == 10L)
    assert(r.getAs[Long]("events") == 100L)
    assert(r.getAs[Long]("top_k") == 1L)
    assert(r.getAs[Long]("top_events") == 91L)
    assert(r.getAs[Long]("share_milli") == 910L)
  }

  test("hourly profile: shares sum to 1000 per type within floor rounding") {
    val rows = Diagnostics.qHourlyProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (typ, rs) =>
      val total = rs.map(_.getAs[Long]("share_milli")).sum
      val slots = rs.length
      // each slot floors, so the sum loses < 1 per slot
      assert(total <= 1000L && total > 1000L - slots, s"$typ sums to $total")
      rs.foreach(r => assert(r.getAs[Int]("hour_of_day") >= 0 &&
        r.getAs[Int]("hour_of_day") <= 23))
    }
  }

  test("gap histogram: hand-placed gaps land in their log2 buckets") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 gaps: 1s (log2(1e6)=19), 2s (20); user 2: one event, no gap
    val df = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), "view"),
      (2L, 1L, t("2024-01-01 10:00:01"), "view"),
      (3L, 1L, t("2024-01-01 10:00:03"), "click"),
      (4L, 2L, t("2024-01-01 10:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Diagnostics.gapHistogram(df).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(out == Map(("view", 19) -> 1L, ("click", 20) -> 1L))
  }

  test("group skew report: counts reconcile and the dial path matches hotGroups") {
    val out = graft.operators.Diagnostics.qGroupSkew(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("event_type", "user_id"))
    val n = Tables.events(spark, sf).count()
    out.foreach { r =>
      assert(r.getLong(2) == n, "total_rows != corpus size")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)
      assert(r.getLong(5) >= 1000, "max below mean is impossible")
      // at fixture scale no key is hot — and the report must agree with
      // the dial the operators actually consult
      val dial = graft.operators.Scale.hotGroups(
        Tables.events(spark, sf), Seq(r.getString(0)))
      assert((r.getString(6) == "grouped_prefix_sum") == dial)
    }
    // the static twin's pinned events threshold must equal the
    // width-aware one the live dial computes — an events schema change
    // breaks here, not silently in the oracle (r17)
    assert(graft.operators.Scale.hotRowThreshold(Tables.events(spark, sf)) ==
      graft.operators.Diagnostics.EventsHotThreshold)
    // a planted giant group flips the recommendation (threshold is
    // width-aware: size the fixture off its own flip point)
    def giantOf(n: Long) = spark.range(n).select(lit("g").as("k"),
      lit("pad0").as("p0"), lit("pad1").as("p1"), lit("pad2").as("p2"),
      lit("pad3").as("p3"), lit("pad4").as("p4"))
    val need = graft.operators.Scale.hotRowThreshold(giantOf(1L))
    val rep = graft.operators.Diagnostics.groupSkewReport(giantOf(need),
      Seq("k")).head()
    assert(rep.getString(6) == "grouped_prefix_sum")
  }

  import spark.implicits._

  test("benford: digit extraction is exact; shares partition to ~1000 milli") {
    val orders = Seq(123.45, 19.99, 950.00, 2.50, 123456.78, 1.00)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
    val out = Diagnostics.benfordFirstDigit(orders).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1" -> 4L, "2" -> 1L, "9" -> 1L), out.toString)
    val fix = Diagnostics.qBenford(spark, sf).cache()
    val s = fix.agg(sum(col("share_milli"))).head().getLong(0)
    assert(s <= 1000 && s > 1000 - 9, s"shares sum $s")
    assert(fix.filter(col("dev_milli") =!=
      abs(col("share_milli") - col("benford_milli"))).count() == 0)
  }

  test("skew report: a planted hot key dominates and sizes the salt factor") {
    // 1 key with 90 rows, 9 keys with 1 row → mean 9.9, max/mean ≈ 9.09
    val fact = ((0 until 90).map(_ => 7L) ++ (11L to 19L))
      .toDF("l_suppkey")
    val out = Diagnostics.joinSkewReport(fact, "l_suppkey").collect()
    val hot = out.head
    assert(hot.getLong(0) == 7L && hot.getLong(1) == 90L)
    // mean_milli = 99*1000/10 = 9900; skew = 90*1000*10/99 = 9090
    assert(hot.getLong(2) == 9900L && hot.getLong(3) == 9090L, hot.toString)
    // salt = ceil(90*10/99) = ceil(9.09) = 10
    assert(hot.getLong(4) == 10L)
    // a uniform key needs no salt
    val uni = Diagnostics.joinSkewReport(
      (1L to 100L).flatMap(k => Seq.fill(3)(k)).toDF("l_suppkey"), "l_suppkey")
      .collect()
    assert(uni.forall(_.getLong(4) == 1L), "uniform keys must report salt 1")
  }
}
