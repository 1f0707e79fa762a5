package graft

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Similarity}
import graft.plans.CosineSimilarity

/** Specs for the beyond-builtin operators: as-of join composition and the
  * native cosine kernel. */
class CustomOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100L),
      (1L, ts("2024-01-01 10:00:20"), 101L),
      (2L, ts("2024-01-01 10:00:10"), 200L))
      .toDF("k", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 9.9),
      (1L, ts("2024-01-01 10:00:20"), 10.1), // simultaneous with trade 101
      (2L, ts("2024-01-01 10:00:30"), 20.0)) // after trade 200 → no match
      .toDF("k", "qt", "price")
    val got = AsOf.asofJoin(trades, quotes, "k", "t", "qt", Seq("price"))
      .orderBy("trade_id")
      .select("trade_id", "price").collect()
    assert(got(0).getDouble(1) == 9.9)   // 10:00:05 → quote at 10:00:00
    assert(got(1).getDouble(1) == 10.1)  // ts >= simultaneous quote visible
    assert(got(2).isNullAt(1))           // no prior quote for key 2
  }

  test("forward asof attaches the earliest right row at or after each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100L),
      (1L, ts("2024-01-01 10:00:20"), 101L),
      (2L, ts("2024-01-01 10:00:40"), 200L))
      .toDF("k", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:10"), 9.9),
      (1L, ts("2024-01-01 10:00:20"), 10.1), // simultaneous with trade 101
      (2L, ts("2024-01-01 10:00:30"), 20.0)) // before trade 200 → no match
      .toDF("k", "qt", "price")
    val got = AsOf.asofJoinForward(trades, quotes, "k", "t", "qt", Seq("price"))
      .orderBy("trade_id")
      .select("trade_id", "price").collect()
    assert(got(0).getDouble(1) == 9.9)   // 10:00:05 → next quote at :10
    assert(got(1).getDouble(1) == 10.1)  // simultaneous quote visible
    assert(got(2).isNullAt(1))           // no future quote for key 2
  }

  test("native cosine kernel is bit-identical to the fold composition") {
    // the interpreted zip_with/aggregate fold is the reference here —
    // Similarity.dot itself now routes through the native DotProduct
    // kernel, so the composition is spelled out to stay the independent
    // witness that both native kernels preserve the fp sequence
    def hofDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    def hofNorm(a: Column): Column =
      sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x))
    val emb = Tables.embeddings(spark, sf).limit(100)
    val pairs = emb.select($"vec_id".as("ida"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("idb"), $"embedding".as("b")))
      .filter($"ida" < $"idb").limit(500)
    val both = pairs.select(
      CosineSimilarity.cosineSim($"a", $"b").as("native"),
      (Similarity.dot($"a", $"b") /
        (Similarity.norm($"a") * Similarity.norm($"b"))).as("kernel"),
      (hofDot($"a", $"b") / (hofNorm($"a") * hofNorm($"b"))).as("fold"))
    assert(both.filter($"native" =!= $"fold" || $"kernel" =!= $"fold").count() == 0)
  }

  test("cosine kernel participates in whole-stage codegen (no fallback)") {
    val emb = Tables.embeddings(spark, sf)
    val df = emb.select(CosineSimilarity.cosineSim($"embedding", $"embedding").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosinesimilarity"), plan)
    // sanity: self-cosine is exactly 1.0 up to fp rounding
    val vals = df.limit(10).collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("cosine kernel rejects non-float-array inputs at analysis") {
    val bad = Seq((Array(1.0, 2.0), Array(2.0, 3.0))).toDF("a", "b") // double arrays
    val ex = intercept[Exception] {
      bad.select(CosineSimilarity.cosineSim($"a", $"b")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("float") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("zero vector yields null cosine, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(CosineSimilarity.cosineSim($"a", $"b")).head().isNullAt(0))
  }

  test("cosine_sim is callable from SQL once the extension registers it") {
    // conf-based injection only applies at session construction; the
    // spec exercises both the extension wiring and the live-session path
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must not throw
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    val viaDsl = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(CosineSimilarity.cosineSim($"a", $"b")).head().getDouble(0)
    assert(viaSql == viaDsl && math.abs(viaSql - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("optimizer rule rewrites dot(x, x) to the fused self-dot, bit-equal") {
    graft.plans.GraftExtensions.register(spark)
    // parquet-backed source: a LocalRelation would be constant-folded
    // away before the rewrite is visible in the optimized plan
    val df = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val q = df.select($"vec_id",
      graft.plans.DotProduct.dotNative($"embedding", $"embedding").as("selfd"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.toLowerCase.contains("selfdot"), s"rule did not fire:\n$opt")
    // values are the identical fp sequence as the binary kernel
    val manual = df.limit(20).collect().map { r =>
      val a = r.getSeq[Float](1)
      var acc = 0.0; a.foreach { x => acc += x.toDouble * x.toDouble }
      r.getLong(0) -> acc
    }.toMap
    q.limit(20).collect().foreach { r =>
      assert(r.getDouble(1) == manual(r.getLong(0)),
        s"mismatch at vec ${r.getLong(0)}")
    }
    // dot over DIFFERENT sides is untouched
    val q2 = df.as("a").join(df.as("b"), $"a.vec_id" =!= $"b.vec_id")
      .select(graft.plans.DotProduct.dotNative($"a.embedding", $"b.embedding"))
    assert(!q2.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("selfdot"))
  }

  test("normalize_text: composed and decomposed forms hash identically after NFC") {
    import graft.plans.NormalizeText.{normalizeText, stripAccents}
    val composed = "caf\u00e9"             // é as U+00E9
    val decomposed = "cafe\u0301"          // e + combining acute
    val df = Seq((composed, decomposed)).toDF("a", "b")
    val r = df.select(
      normalizeText($"a").as("na"), normalizeText($"b").as("nb"),
      md5(normalizeText($"a")).as("ha"), md5(normalizeText($"b")).as("hb"),
      stripAccents($"a").as("sa")).head()
    assert(r.getAs[String]("na") == r.getAs[String]("nb"))
    assert(r.getAs[String]("ha") == r.getAs[String]("hb"),
      "digest dedup must see one document, not two")
    assert(r.getAs[String]("sa") == "cafe")
    // raw strings really differ (the test would be vacuous otherwise)
    assert(composed != decomposed)
  }

  test("normalize_text NFKC folds ligatures and width variants; SQL surface works") {
    import graft.plans.NormalizeText.normalizeText
    val df = Seq(("\ufb01le \uff21")).toDF("s") // ﬁ ligature + fullwidth A
    assert(df.select(normalizeText($"s", "NFKC")).head().getString(0) == "file A")
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT normalize_text('cafe\u0301') = normalize_text('caf\u00e9') AS same")
      .head().getBoolean(0)
    assert(viaSql)
    intercept[IllegalArgumentException] {
      graft.plans.NormalizeText(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
  }

  test("grouping-sets gid distinguishes a NULL-valued subtotal from the grand total") {
    import spark.implicits._
    // event_type NULL is legitimate data (Silver.clean passes it through):
    // the null-ness-derived gid of the old form collapsed the NULL
    // subtotal into the grand total; GROUPING()-derived gids must not
    val rows = Seq(
      (Some("click"), 2024, 1.0), (Some("click"), 2025, 2.0),
      (None: Option[String], 2024, 4.0), (None: Option[String], 2024, 8.0))
      .toDF("event_type", "year", "value")
    val got = graft.operators.Advanced.groupingSetsAgg(rows).collect()
    // gid 1 = by event_type (year aggregated away): click + the NULL group
    val byType = got.filter(_.getAs[Int]("gid") == 1)
    assert(byType.length == 2)
    val nullSub = byType.find(_.isNullAt(0)).get
    assert(nullSub.getAs[Long]("n") == 2 && nullSub.getAs[Double]("sum_value") == 12.0)
    // gid 2 = by year; NULL event_type rows participate, never leak a gid-3 look-alike
    val byYear = got.filter(_.getAs[Int]("gid") == 2)
    assert(byYear.map(_.getAs[Int]("year")).toSet == Set(2024, 2025))
    // gid 3 = the single grand total, distinct from the NULL subtotal
    val totals = got.filter(_.getAs[Int]("gid") == 3)
    assert(totals.length == 1 && totals.head.getAs[Long]("n") == 4
      && totals.head.getAs[Double]("sum_value") == 15.0)
    // deterministic order: NULLs pinned first within each gid
    assert(got.map(_.getAs[Int]("gid")).toSeq == got.map(_.getAs[Int]("gid")).toSeq.sorted)
    assert(byType.head.isNullAt(0), "NULL event_type sorts first in gid 1")
  }

  test("binned range join equals the naive theta-join, incl. bin-boundary pairs") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:29:59")), // inside the 30-min gap of 1
      (3L, 7L, ts("2024-01-01 10:30:00")), // exactly at 1's bound (inclusive), next bin
      (4L, 7L, ts("2024-01-01 10:30:01")), // just past 1's bound
      (5L, 8L, ts("2024-01-01 10:05:00")), // other user — never pairs with 7's
      (6L, 7L, ts("2024-01-01 10:00:00"))) // ties 1 exactly → strict > excludes
      .toDF("event_id", "user_id", "ts")
    val a = ev.select($"event_id".as("event_a"), $"user_id", $"ts".as("ts_a"))
    val b = ev.select($"event_id".as("event_b"), $"user_id", $"ts".as("ts_b"))
    val binned = graft.operators.Ranged
      .rangeJoinBinned(a, b, "user_id", "ts_a", "ts_b", 1800L)
      .select("event_a", "event_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b, Seq("user_id"))
      .filter($"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 1800 SECONDS"))
      .select("event_a", "event_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive,
      s"binned missed ${naive -- binned}, extra ${binned -- naive}")
    assert(naive.contains((1L, 3L)) && !naive.contains((1L, 4L)) &&
      !naive.contains((1L, 6L)) && !naive.contains((1L, 5L)))
  }

  test("decodeStubExpr: 8 dims in [0,1), deterministic, payload-sensitive") {
    import graft.operators.Multimodal
    val media = Multimodal.asMedia(Tables.documents(spark, sf)).limit(50)
    val feats = media
      .select($"doc_id", Multimodal.decodeStubExpr($"payload").as("features"))
    val rows = feats.collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 8, s"doc ${r.getLong(0)}: ${f.length} dims")
      assert(f.forall(v => v >= 0.0 && v < 1.0), s"doc ${r.getLong(0)}: $f")
    }
    // deterministic: same expression, same payloads → identical arrays
    val again = feats.collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq == again.map(_.getSeq[Double](1)).toSeq)
    // distinct payloads produce distinct feature vectors (hash sensitivity)
    assert(rows.map(_.getSeq[Double](1)).distinct.length > 40)
  }

  test("png/wav codec round trip returns the exact encoded pixels/samples") {
    import graft.operators.Multimodal
    // driver-side unit check of the codec formulas the oracle mirrors
    for (id <- Seq(0L, 1L, 12L, 13L, 40L, 97L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngFor(id)))
      assert(img.getWidth == 8 && img.getHeight == 1 + (id % 13).toInt)
      val r = img.getRaster
      for (y <- 0 until img.getHeight; x <- 0 until 8; c <- 0 until 3)
        assert(r.getSample(x, y, c) == ((id + 7L * c + 31L * (y * 8 + x)) % 256L).toInt,
          s"doc $id pixel ($x,$y,$c)")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.wavFor(id)))
      val data = in.readAllBytes(); in.close()
      assert(data.length == 32 + (id % 41).toInt)
      data.zipWithIndex.foreach { case (b, j) =>
        assert((b & 0xff) == ((id + 17L * j) % 256L).toInt, s"doc $id sample $j")
      }
    }
    // distributed path: decodeStub routes real PNG/WAV payloads through the
    // real codecs (feature 0/1 = w/4096, h/4096 for images)
    val media = Seq(
      Multimodal.Media(5L, "image/png", Multimodal.pngFor(5L)),
      Multimodal.Media(6L, "audio/wav", Multimodal.wavFor(6L)),
      Multimodal.Media(7L, "video/mp4", Array[Byte](1, 2, 3))).toDS()
    val feats = Multimodal.decodePartitions(media).collect()
      .map(f => f.doc_id -> f.features).toMap
    assert(feats(5L)(0) == 8 / 4096.0 && feats(5L)(1) == (1 + 5 % 13) / 4096.0)
    assert(feats(6L)(0) == 8000 / 48000.0 && feats(6L)(1) == 1 / 4.0)
    // undecodable container falls back to the deterministic hash features
    assert(feats(7L).sameElements(Multimodal.hashFeatures(Array[Byte](1, 2, 3), 8)))
  }

  test("animated-GIF frame sampling round-trips every sampled frame exactly") {
    import graft.operators.Multimodal
    for (id <- Seq(0L, 1L, 4L, 13L, 97L)) {
      val frames = Multimodal.sampleGifFrames(id, Multimodal.gifFor(id))
      val n = 2 + (id % 5).toInt
      // every 2nd frame of the n-frame animation, full dims, exact gray
      assert(frames.map(_.frame_idx) == (0 until n by 2))
      frames.foreach { f =>
        assert(f.n_frames == n && f.width == 8 && f.height == 8)
        assert(f.gray == ((11L * id + 29L * f.frame_idx) % 256L).toInt,
          s"doc $id frame ${f.frame_idx}")
      }
    }
    // a payload no reader accepts yields zero frames, not a crash
    assert(Multimodal.sampleGifFrames(9L, Array[Byte](1, 2, 3)).isEmpty)
    // distributed path agrees with the driver-side sampler
    val df = Multimodal.gifFrameSamples(Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)).collect()
    assert(df.length == (0L until 20L).map(id => (2 + id % 5 + 1) / 2).sum)
  }

  test("DFT recovers the generated tone bin through the real WAV codec") {
    import graft.operators.Multimodal
    // direct DFT sanity off the codec path: pure bin-5 sine → bin 5
    val pure = Array.tabulate(64)(j =>
      (127 + math.round(100.0 * math.sin(2.0 * math.Pi * 5 * j / 64))).toInt.toByte)
    assert(Multimodal.dominantBin(pure) == 5)
    // full path: synthesize → WAV encode → decode → DFT, every bin 1..31
    (0L to 30L).foreach { id =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.toneWavFor(id)))
      val s = try in.readAllBytes() finally in.close()
      assert(s.length == Multimodal.ToneN)
      assert(Multimodal.dominantBin(s) == Multimodal.toneBin(id),
        s"doc $id: peak bin mismatch")
    }
  }

  test("NN resize samples exactly the formula pixels through the codec") {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = Seq(3L, 7L, 12L) // heights 4, 8, 13 — incl. non-divisible
    val out = Multimodal.resizeStats(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    ids.foreach { id =>
      val h = 1 + (id % 13).toInt
      def expect(c: Int): Long =
        (for (j <- 0 until 4; i <- 0 until 4)
          yield (id + 7 * c + 31 * ((j * h / 4) * 8 + (i * 8 / 4))) % 256).sum
      assert(out(id) == ((expect(0), expect(1), expect(2))), s"doc $id")
    }
  }

  test("decontaminated split quarantines only leaking train docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // find one test-split doc and one train-split doc id under the
    // deterministic hash split, then plant the test doc's text into the
    // train doc — that train doc must land in quarantine
    val base = (1L to 60L).map(i =>
      (i, (1 to 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val split = TextAnalysis.withSplit(base)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val testId = split.collectFirst { case (id, "test") => id }.get
    val trainIds = split.collect { case (id, "train") => id }.toSeq.sorted
    val leakId = trainIds.head
    val docs = base.withColumn("text",
      when($"doc_id" === leakId,
        base.filter($"doc_id" === testId).select("text").collect()(0).getString(0))
        .otherwise($"text"))
    val out = TextAnalysis.decontaminatedSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(leakId) == ("train", "quarantined"))
    // everyone else keeps their split; test/val rows are never touched
    out.foreach { case (id, (s, f)) =>
      if (id != leakId) assert(s == f, s"doc $id moved from $s to $f")
      if (s != "train") assert(f == s)
    }
    assert(out.size == 60)
  }
}
