package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Overlap, Quant, Similarity, TextAnalysis}
import graft.functions.TextFns

/** Semantics tests for the training-data-pipeline operators: approximate
  * methods (MinHash LSH, SimHash, sign-LSH ANN) are checked against their
  * exact counterparts on the fixture corpus with planted near-dups. */
class LlmOpsSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("minhash LSH pairs equal exact shingle-jaccard pairs (threshold 0.8)") {
    val exact = Dedup.shingleJaccardPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("simhash near-pairs overlap planted near-dups, no wild false positives") {
    val exact = Dedup.shingleJaccardPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.intersect(exact).size >= (exact.size * 0.7).toInt,
      s"simhash found only ${sim.intersect(exact).size} of ${exact.size} planted pairs")
    assert((sim -- exact).size <= sim.size / 2, "too many sub-threshold pairs")
  }

  test("paired-block blocking: identical pairs to byte blocking, far fewer candidates") {
    // both schemes are pigeonhole-complete at Hamming ≤ 6, so after exact
    // verification the RESULTS must be identical — blocking is cost-only
    val wide = Dedup.simhashPairs(docs, 6, wideBlocks = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = Dedup.simhashPairs(docs, 6, wideBlocks = false)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == narrow, s"wide missed ${narrow -- wide}, extra ${wide -- narrow}")
    // the point of 16-bit keys: the candidate set (pre-verification join
    // output) collapses — this is the term that dominates at corpus scale
    val sh = graft.operators.Dedup.simhash(docs)
    val c8 = Dedup.simhashCandidates8(sh).count()
    val c16 = Dedup.simhashCandidates16(sh).count()
    assert(c16 < c8 / 4, s"paired-block candidates $c16 not ≪ byte-block $c8")
    // Hamming > 6 must refuse the 16-bit scheme (incomplete there)
    intercept[IllegalArgumentException] { Dedup.simhashPairs(docs, 7) }
    // the corpus-size dial: (14,8) — 3003 families of 32-bit keys, the
    // configuration for ≥10^7 docs — must return the identical verified
    // pairs (blocking is cost-only at ANY complete configuration)
    val blocked = Dedup.simhashPairsBlocked(docs, 6, nBlocks = 14, keep = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == wide, s"(14,8) missed ${wide -- blocked}, extra ${blocked -- wide}")
    // incomplete configurations refuse loudly: 14-8=6 < 7
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsBlocked(docs, 7, nBlocks = 14, keep = 8)
    }
    // the auto dial: picks (8,2) below the measured ~4M-doc crossover,
    // (14,8) above it, and returns the identical verified pairs on
    // either side of the switch (cost-only, like every complete config)
    assert(Dedup.simhashBlockingFor(100000L) == ((8, 2)))
    assert(Dedup.simhashBlockingFor(100000000L) == ((14, 8)))
    val autoSmall = Dedup.simhashPairsAuto(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val autoLarge = Dedup.simhashPairsAuto(docs, 6, estimatedDocs = Some(100000000L))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoSmall == wide && autoLarge == wide,
      s"auto dial changed results: small ${autoSmall.size}, large ${autoLarge.size}, expected ${wide.size}")
  }

  test("dup clusters: hash-min propagation finds transitive components") {
    // chain 1-2-3 (1-3 never directly paired), separate pair 5-6, and a
    // 4-node star 10-{11,12,13}; singletons don't appear
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (10L, 12L), (10L, 13L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("sign-LSH ANN recall vs brute force (noise embeddings → modest but > fraction scanned)") {
    val emb = Tables.embeddings(spark, sf)
    val bf = Similarity.bruteForceTopK(emb, 5, 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(emb, 5, 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ann).size.toDouble / bf.size
    // 4 planes + Hamming-1 probes scan ~5/16 ≈ 31% of the corpus; the
    // fixture embeddings are unclustered noise, so recall ≈ 0.45 is the
    // data's ceiling — assert we at least beat the scanned fraction.
    assert(recall > 0.31 + 0.04, s"recall $recall not better than scanned fraction")
  }

  test("int8 quantize stats on known vectors: codes, saturation, zero guard") {
    // power-of-two components → every intermediate is an exact double
    // apart from scale itself; expected values mirror the formula with
    // hand-rounded codes (round half AWAY from zero: -63.5 → -64)
    val df = Seq((1L, Array(8f, -4f, 1f, 0.5f)), (2L, Array(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Quant.quantizeStats(df).orderBy("vec_id").collect()
    val scale = 8.0 / 127.0
    val codes = Seq(127L, -64L, 16L, 8L)
    val expErr = Seq(8.0, -4.0, 1.0, 0.5).zip(codes)
      .map { case (x, q) => math.abs(x - q * scale) }.max
    assert(out(0).getAs[Double]("scale") == scale)
    assert(out(0).getAs[Double]("max_err") == expErr)
    assert(out(0).getAs[Long]("n_sat") == 1L)
    // all-zero vector: scale 0 → reconstruct 0, nothing saturates
    assert(out(1).getAs[Double]("scale") == 0.0)
    assert(out(1).getAs[Double]("max_err") == 0.0)
    assert(out(1).getAs[Long]("n_sat") == 0L)
  }

  test("int8-quantized cosine top-k keeps high recall vs the float top-k") {
    val emb = Tables.embeddings(spark, sf)
    val bf = Similarity.bruteForceTopK(emb, 5, 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qz = Quant.quantizedTopK(emb, 5, 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(qz).size.toDouble / bf.size
    // int8 keeps ~2 decimal digits per element; on 64-dim vectors the
    // cosine perturbation is ~1e-3 — far below typical top-5 margins
    assert(recall > 0.8, s"quantized recall $recall")
    // every vector saturates its max element by construction
    val minSat = Quant.quantizeStats(emb).agg(min("n_sat")).head().getLong(0)
    assert(minSat >= 1L)
  }

  test("int8 codes: binary layout is 1 byte/dim and codes·scale = reconstruct") {
    val emb = Tables.embeddings(spark, sf)
    // the serving layout really is dim bytes per vector (4× vs float32)
    val t = Quant.int8ServingTable(emb)
    val sizes = t.select(length(col("codes"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(64), s"code sizes $sizes")
    // fused native encoder agrees bit-for-bit with the reconstruct path:
    // codes·scale must reproduce exactly the vectors QuantReconstruct builds
    val both = emb
      .select(col("vec_id"), graft.plans.Int8Vec.codes(col("embedding")).as("codes"),
        (array_max(transform(col("embedding"), v => abs(v.cast("double")))) /
          Quant.Levels.toDouble).as("scale"),
        graft.plans.QuantReconstruct.reconstructNative(col("embedding")).as("de"))
      .collect()
    both.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      val scale = r.getAs[Double]("scale")
      val de = r.getSeq[Double](r.fieldIndex("de"))
      assert(codes.length == de.length)
      codes.zip(de).foreach { case (q, d) =>
        assert(q.toDouble * scale == d,
          s"vec ${r.getLong(0)}: code $q · $scale != reconstruct $d")
      }
    }
  }

  test("int8 serving top-k: integer-dot ranking = dequantized-float ranking") {
    // scales cancel in cosine, so serving from pure int8 dots must rank
    // identically to the dequantized-float path (same codes underneath;
    // fp association differs but fixture margins dwarf 1-ulp effects)
    val emb = Tables.embeddings(spark, sf)
    val viaInt = Quant.int8TopK(emb, 5, 50)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaFloat = Quant.quantizedTopK(emb, 5, 50)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaInt == viaFloat, "int8-dot ranking diverged from dequantized ranking")
  }

  test("int8_codes / int8_dot are SQL-callable after extension registration") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT int8_dot(int8_codes(array(3.0F, -4.0F)), int8_codes(array(3.0F, -4.0F))) AS d")
      .head().getLong(0)
    // codes for (3,-4): scale 4/127 → (95, -127); dot = 95² + 127²
    assert(got == 95L * 95 + 127L * 127, s"got $got")
  }

  test("corpus minhash sketch: union sketch = elementwise min of shard sketches") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = Overlap.mergeSigs(Overlap.corpusSig(a), Overlap.corpusSig(b))
      .collect()(0)
    val whole = Overlap.corpusSig(docs).collect()(0)
    (0 until Overlap.NFuncs).foreach { i =>
      assert(merged.getAs[Long](s"h$i") == whole.getAs[Long](s"h$i"),
        s"h$i: merged != whole-corpus sketch")
    }
  }

  test("overlap estimate: identical corpora -> 1.0; estimate tracks exact") {
    val sameSig = Overlap.corpusSig(docs).collect()(0)
    val self = Overlap.mergeSigs(Overlap.corpusSig(docs), Overlap.corpusSig(docs))
      .collect()(0)
    (0 until Overlap.NFuncs).foreach(i =>
      assert(self.getAs[Long](s"h$i") == sameSig.getAs[Long](s"h$i")))
    val row = Overlap.overlapEstimate(docs).collect()(0)
    val est = row.getAs[Double]("est_jaccard")
    val exact = row.getAs[Double]("exact_jaccard")
    // 64 functions -> stderr ~ sqrt(J(1-J)/64) ≈ 0.06; allow 4 sigma
    assert(math.abs(est - exact) < 0.25, s"est $est vs exact $exact")
  }

  test("LM bucket score: garbage trigrams rank below corpus-typical text") {
    // ten docs sharing common running text, one junk doc of trigrams
    // that appear nowhere else → junk gets the lowest mean bucket and a
    // rarest_bucket of 0 (count-1 trigrams)
    val natural = (1L to 10L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val junk = Seq((99L, "zq jx qv xz vj kq zx jq vq"))
    val out = TextAnalysis.lmBucketScore((natural ++ junk).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_bucket"), r.getAs[Long]("rarest_bucket"))).toMap
    val junkScore = out(99L)._1
    assert((1L to 10L).forall(i => out(i)._1 > junkScore),
      s"junk $junkScore should score below natural ${out(1L)._1}")
    assert(out(99L)._2 == 0L, "junk doc must contain a count-1 trigram")
    assert(out(1L)._2 > 0L, "shared text appears 10x -> no rare trigram")
  }

  test("LM bucket score: sub-trigram docs drop out instead of mis-sequencing") {
    val out = TextAnalysis.lmBucketScore(
      Seq((1L, "ab"), (2L, "abcd")).toDF("doc_id", "text")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
    assert(out(0).getAs[Long]("n_tris") == 2L)
  }

  test("native int8 reconstruct is bit-identical to the HOF composition") {
    val emb = Tables.embeddings(spark, sf)
    val native = Quant.reconstructNative(emb)
    val composed = Quant.reconstructComposed(emb)
    val diff = native.as("n").join(composed.as("c"), "vec_id")
      .filter(col("n.de") =!= col("c.de"))
    assert(diff.count() == 0L)
    // exact-tie rounding: maxabs 127 → scale exactly 1.0, so ±2.5 are
    // true binary ties and must go AWAY from zero; zero guard holds
    val ties = Seq((1L, Array(127f, 2.5f, -2.5f, 1f)), (2L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Quant.reconstructNative(ties.withColumn("label", lit("")))
      .orderBy("vec_id").collect()
    assert(got(0).getSeq[Double](2) == Seq(127.0, 3.0, -3.0, 1.0))
    assert(got(1).getSeq[Double](2) == Seq(0.0, 0.0))
  }

  test("cosine is bit-exact on known vectors") {
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.5f))).toDF("a", "b")
    val got = df.select(
      Similarity.dot($"a", $"b").as("dot"),
      Similarity.norm($"a").as("na")).head()
    assert(got.getDouble(0) == 3.0)
    assert(got.getDouble(1) == math.sqrt(5.0))
  }

  test("shingles, fingerprint, token count on literal text") {
    val df = Seq("The quick  brown fox jumps").toDF("text")
    val r = df.select(
      TextFns.shingles($"text").as("sh"),
      TextFns.fingerprint($"text").as("fp"),
      TextFns.tokenCount($"text").as("tc"),
      TextFns.wordCount($"text").as("wc")).head()
    assert(r.getSeq[String](0) == Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(r.getString(1).length == 32)
    assert(r.getInt(2) == 5)
    assert(r.getInt(3) == 5)
    // fingerprint is whitespace/case insensitive
    val fp2 = Seq("the QUICK brown fox JUMPS").toDF("text")
      .select(TextFns.fingerprint($"text")).head().getString(0)
    assert(r.getString(1) == fp2)
  }

  test("langId prefers the language whose stopwords dominate") {
    val df = Seq(
      "the cat and the dog is in a house of cards",
      "der hund und die katze ist nicht hier").toDF("text")
    val s = TextFns.langScores($"text")
    val got = df.select(TextFns.langId(s("en"), s("de"), s("es"), s("fr"))).collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("en", "de"))
  }

  test("exact dedup groups identical texts under one survivor") {
    val d = Seq((1L, "same text here"), (2L, "same text here"), (3L, "different"))
      .toDF("doc_id", "text")
    val got = d.withColumn("text_hash", md5($"text"))
      .groupBy("text_hash").agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("copies"))
    val m = got.collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == 2L && m(3L) == 1L)
  }

  test("embedding near-dup: exact finds all pairs; LSH variant is an exact subset") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Dedup.embeddingNearDupPairs(emb, 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "threshold 0.4 should yield some pairs on the fixture")
    val lsh = Dedup.embeddingNearDupLsh(emb, 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty, s"LSH produced false positives ${lsh -- exact}")
    // identical vectors always share a bucket → an identical pair, if any,
    // is always recovered; on noise vectors recall is probabilistic, so
    // only bound it loosely above the no-blocking-at-all floor
    assert(lsh.size * 10 >= exact.size,
      s"LSH recall collapsed: ${lsh.size}/${exact.size}")
  }

  test("winnowing: shared runs always collide, sketch is smaller than the shingle set") {
    import graft.operators.TextAnalysis
    val common = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d = Seq(
      (1L, common + " alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words entirely unrelated content here nothing shared at all " + common),
      (3L, "no overlap with anything else whatsoever in this tiny corpus of text"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowingOverlapPairs(d, minShared = 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1 and 2 share a 14-word run >> w+n-1 = 6 words → guaranteed collision
    assert(pairs.contains((1L, 2L)), s"shared run must produce a common fingerprint: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc must not pair")
    // sketch is a strict subsample of the shingle hashes
    val sizes = TextAnalysis.winnowed(d)
      .select(size($"fps").as("nf")).collect().map(_.getInt(0))
    val shingleCounts = d.select(TextFns.words($"text").as("ws"))
      .select(size(TextFns.shingleSeqFromWords($"ws"))).collect().map(_.getInt(0))
    assert(sizes.zip(shingleCounts).forall { case (f, s) => f < s && f > 0 })
    // identical docs → identical sketches
    val dup = Seq((10L, common), (11L, common)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowed(dup).select("fps").collect().map(_.getSeq[Long](0))
    assert(fps(0) == fps(1))
    // row form (the corpus-scale path) selects exactly the array form's set
    val viaRows = TextAnalysis.winnowedRows(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaArray = TextAnalysis.winnowed(d)
      .select($"doc_id", explode($"fps").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaRows == viaArray,
      s"row/array winnowing diverge: ${viaRows -- viaArray} vs ${viaArray -- viaRows}")
  }

  test("IVF ANN: recall beats the scanned fraction (data-adaptive cells > random planes)") {
    val emb = Tables.embeddings(spark, sf)
    val bf = Similarity.bruteForceTopK(emb, 5, 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.Ivf.ivfTopK(emb, 5, 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    val scanned = graft.operators.Ivf.NProbe.toDouble / graft.operators.Ivf.Cells
    // measured 0.668 at sf0.001 (seeded k-means → stable); bound leaves
    // headroom for fp-order jitter in training while staying well above
    // the 0.375 scanned-fraction floor
    assert(recall > scanned + 0.1, s"IVF recall $recall ≤ scanned fraction $scanned")
  }

  test("adaptive IVF probe: full margin ≡ static nProbe; tight margin prunes cells, keeps recall") {
    import graft.operators.Ivf
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.trainCentroids(emb)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // margin ≥ 2 spans the whole cosine score range → every maxProbe cell
    // qualifies; the adaptive rule must then be a no-op vs static nProbe
    val full = Ivf.ivfTopKAdaptive(emb, cents, 5, 20,
      maxProbe = Ivf.NProbe, margin = 2.0).collect().toSeq
    val static0 = Ivf.ivfTopKWith(emb, cents, 5, 20).collect().toSeq
    assert(full == static0, "margin=2 adaptive probe must equal static nProbe")
    // the default margin must actually prune: mean probed cells strictly
    // below the static breadth, never zero, never above maxProbe
    val probed = emb.filter($"vec_id" < 50)
      .select(size(Ivf.adaptiveProbeCells($"embedding", cents)).as("n"))
      .collect().map(_.getInt(0))
    assert(probed.forall(n => n >= 1 && n <= Ivf.NProbe))
    val mean = probed.sum.toDouble / probed.length
    assert(mean < Ivf.NProbe, s"adaptive probe never pruned (mean $mean)")
    // recall at the default margin still beats the (now smaller) scanned
    // fraction — the boundary queries it keeps wide are the ones recall
    // depends on
    val bf = pairs(Similarity.bruteForceTopK(emb, 5, 50))
    val ada = pairs(Ivf.ivfTopKAdaptive(emb, cents, 5, 50))
    val recall = ada.intersect(bf).size.toDouble / bf.size
    val scanned = mean / Ivf.Cells
    assert(recall > scanned, s"adaptive recall $recall ≤ scanned fraction $scanned")
  }

  test("PII scrub replaces emails/phones/IPs with placeholders and counts them") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org or call 555-123-4567 from 10.0.0.7 now"),
      (2L, "no pii here, just 1.2 version and code-4567"),
      (3L, "two mails a@b.io c@d.co one ip 192.168.1.1")).toDF("doc_id", "text")
    val (emails, phones, ips, clean) = graft.operators.Curation.scrubPii(col("text"))
    val rows = df.select(col("doc_id"), emails.as("e"), phones.as("p"),
        ips.as("i"), clean.as("c"))
      .orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 1 && rows(0).getInt(3) == 1)
    assert(rows(0).getString(4) ==
      "mail <EMAIL> or call <PHONE> from <IP> now")
    assert(rows(1).getInt(1) == 0 && rows(1).getInt(2) == 0 && rows(1).getInt(3) == 0)
    assert(rows(1).getString(4) == "no pii here, just 1.2 version and code-4567",
      "version numbers and short digit runs survive")
    assert(rows(2).getInt(1) == 2 && rows(2).getInt(3) == 1)
    assert(rows(2).getString(4) == "two mails <EMAIL> <EMAIL> one ip <IP>")
  }

  test("repetition ratio: degenerate text scores high, varied text low") {
    val df = Seq(
      (1L, Seq.fill(50)("spam ham eggs").mkString(" ")), // one 3-gram pattern repeated
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")),    // all shingles unique
      (3L, "too short")).toDF("doc_id", "text")
    val r = graft.operators.Curation.repetition(df).orderBy("doc_id").collect()
    val degenerate = r(0)
    assert(degenerate.getAs[Double]("repetition_ratio") > 0.9,
      s"repeated pattern: ${degenerate.getAs[Double]("repetition_ratio")}")
    assert(degenerate.getAs[Boolean]("is_repetitive"))
    assert(r(1).getAs[Double]("repetition_ratio") == 0.0)
    assert(!r(1).getAs[Boolean]("is_repetitive"))
    assert(r(2).getAs[Int]("total_ngrams") == 1, "sub-3-word fallback shingle")
    assert(r(2).getAs[Double]("repetition_ratio") == 0.0)
  }

  test("stratified sample: per-stratum rates honored, selection deterministic") {
    val sampled = graft.operators.Curation
      .stratifiedSample(docs, Map("en" -> 50), defaultRate = 20)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(math.abs(enRate - 0.5) < 0.15, s"en kept at $enRate, want ≈0.5")
    totals.keys.filter(_ != "en").foreach { l =>
      val r = byLang.getOrElse(l, 0L).toDouble / totals(l)
      assert(r < 0.45, s"$l kept at $r, want ≈0.2")
    }
    // determinism: a second evaluation keeps the exact same ids
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.operators.Curation
      .stratifiedSample(docs, Map("en" -> 50), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("log-round clustering equals label propagation; converges where it can't") {
    // equality on the organic near-dup graph
    val pairs = Dedup.shingleJaccardPairs(docs, 0.8)
    def labelSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelSet(Dedup.dupClustersLogRounds(pairs))
      == labelSet(Dedup.dupClusters(pairs)), "variants disagree on real pairs")
    // a 300-node chain has diameter 299: hop-propagation trips its
    // 50-round guard (by design — not duplicate-shaped), the pointer-
    // jumping variant converges in O(log d) rounds
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // a tight explicit bound asserts the same semantics (hop propagation
    // cannot converge within the guard on a high-diameter graph) without
    // paying 50 Spark rounds just to throw
    intercept[IllegalArgumentException] {
      Dedup.dupClusters(chain, maxRounds = 5).collect()
    }
    val fast = Dedup.dupClustersLogRounds(chain, maxRounds = 30).collect()
    assert(fast.length == 300)
    assert(fast.forall(_.getAs[Long]("cluster_id") == 0L),
      "every chain node must label to the component min")
    // the default path self-escalates to pointer jumping after 8 hop
    // rounds, so the same high-diameter graph converges without tuning
    val auto = Dedup.dupClusters(chain).collect()
    assert(auto.length == 300 && auto.forall(_.getAs[Long]("cluster_id") == 0L),
      "auto-escalated dupClusters must converge on a 299-diameter chain")
  }

  test("curate() composes funnel → dedup → split → pack with a consistent ledger") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val r = graft.operators.Curation.curate(docs, out)
    assert(r.input == docs.count())
    assert(r.afterQuality <= r.input && r.afterQuality > 0)
    assert(r.afterDedup <= r.afterQuality && r.afterDedup > 0,
      s"dedup dropped nothing or everything: $r")
    assert(r.splitCounts.values.sum == r.afterDedup)
    assert(r.splitCounts.keySet == Set("train", "val", "test"), r.splitCounts.toString)
    // corpus landed partitioned by split → trainer reads partition-prune
    Seq("train", "val", "test").foreach { s =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/corpus/split=$s")), s"missing split=$s")
    }
    val curated = spark.read.parquet(s"$out/corpus")
    assert(curated.count() == r.afterDedup)
    // the funnel's verdict holds on what was written
    val funnel = graft.operators.Curation.filterFunnel(curated)
    assert(funnel.filter(!col("keep")).count() == 0, "a dropped doc leaked through")
    // manifest covers exactly the train docs
    val manifest = spark.read.parquet(s"$out/train_pack_manifest")
    assert(manifest.count() == r.trainPacks)
    assert(manifest.agg(sum("n_docs")).head().getLong(0) == r.splitCounts("train"))
    // deterministic: a rebuild into the same dir reproduces the ledger
    val r2 = graft.operators.Curation.curate(docs, out)
    assert(r2 == r, s"rebuild diverged: $r2 vs $r")
  }

  test("curate() with a mixture stage rebalances the written corpus to declared sources") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-mix").toString
    val shares = Map("src0" -> 6000, "src1" -> 4000)
    val r = graft.operators.Curation.curate(docs, out,
      mixtureBp = Some(shares))
    assert(r.afterMixture.isDefined, "mixture count missing from the ledger")
    assert(r.afterMixture.get <= r.afterDedup,
      s"mixture grew the corpus: $r")
    assert(r.splitCounts.values.sum == r.afterMixture.get,
      "split ledger counts something other than the mixed corpus")
    val curated = spark.read.parquet(s"$out/corpus")
    assert(curated.count() == r.afterMixture.get)
    assert(curated.select("source").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(shares.keySet), "undeclared source in the written corpus")
    // the no-mixture path is unchanged: ledger has no mixture entry
    val out2 = java.nio.file.Files.createTempDirectory("graft-curate-nomix").toString
    assert(graft.operators.Curation.curate(docs, out2).afterMixture.isEmpty)
  }

  test("sequence packing: contiguous shard layout, offsets within capacity") {
    val cap = 256
    val packed = graft.operators.Curation.seqPack(docs, cap, nShards = 4)
    val rows = packed.orderBy("shard", "doc_id").collect()
    assert(rows.forall(r => r.getAs[Long]("pack_offset") >= 0
      && r.getAs[Long]("pack_offset") < cap), "every doc starts inside its pack")
    // within a shard, start_tok is the running sum of preceding token counts
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_tok") == cum,
          s"doc ${r.getAs[Long]("doc_id")} start ${r.getAs[Long]("start_tok")} != $cum")
        cum += r.getAs[Int]("token_count")
      }
    }
    // pack ids are dense per shard: max pack ≈ total tokens / capacity
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (s, rs) =>
      val totalTok = rs.map(_.getAs[Int]("token_count").toLong).sum
      val maxPack = rs.map(_.getAs[Long]("pack_id")).max
      assert(maxPack <= totalTok / cap, s"shard $s pack ids not dense")
    }
  }

  test("source cap: quota enforced per source, salted path exactly equal") {
    import graft.operators.Curation
    val cap = 5
    val plain = Curation.sourceCap(docs, cap)
    val perSource = plain.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inputPerSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    inputPerSource.foreach { case (src, n) =>
      assert(perSource(src) == math.min(cap.toLong, n),
        s"source $src kept ${perSource(src)} of $n at cap $cap")
    }
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("rank_in_source"))
    val a = plain.select("doc_id", "rank_in_source").collect().map(key).sortBy(_._1)
    val b = Curation.sourceCapSalted(docs, cap, saltBuckets = 4)
      .select("doc_id", "rank_in_source").collect().map(key).sortBy(_._1)
    assert(a.sameElements(b), "salted source cap diverges from plain window")
  }

  test("source mix: exact target proportions, undeclared sources dropped") {
    import graft.operators.Curation
    val shares = Map("src0" -> 5000, "src1" -> 3000, "src2" -> 2000)
    val mixed = Curation.sourceMix(docs, shares)
    val out = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet.subsetOf(shares.keySet), "undeclared source leaked through")
    val cnts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = shares.map { case (s, bp) => cnts.getOrElse(s, 0L) * 10000L / bp }.min
    shares.foreach { case (s, bp) =>
      val expect = t * bp / 10000L
      assert(out.getOrElse(s, 0L) == expect,
        s"source $s kept ${out.getOrElse(s, 0L)}, mixture demands $expect")
    }
    // maximality: growing T by one source's granularity would overdraw
    // the binding source (the one whose count/share set T)
    val binding = shares.minBy { case (s, bp) => cnts.getOrElse(s, 0L) * 10000L / bp }
    assert((t + 10000 / binding._2 + 1) * binding._2 / 10000L
      > cnts.getOrElse(binding._1, 0L),
      "T is not maximal: the binding source could contribute more")
  }

  test("token mixture: per-source token caps honored with one straddler at most") {
    import graft.operators.Curation
    val shares = Map("src0" -> 6000, "src1" -> 4000)
    val mixed = Curation.sourceMixTokens(docs, shares).collect()
    assert(mixed.nonEmpty, "mixture kept nothing")
    assert(mixed.map(_.getAs[String]("source")).toSet.subsetOf(shares.keySet),
      "undeclared source leaked through")
    mixed.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val cap = rows.head.getAs[Long]("source_token_cap")
      // every kept doc starts under the cap; kept tokens overshoot the
      // cap only by the straddler's tail
      rows.foreach(r => assert(r.getAs[Long]("start_tok") < cap))
      val kept = rows.map(_.getAs[Int]("token_count").toLong).sum
      val straddler = rows.maxBy(_.getAs[Long]("start_tok"))
      assert(kept - straddler.getAs[Int]("token_count") < cap,
        s"source $src kept $kept tokens against cap $cap")
      // caps follow the declared proportions exactly (integer floor)
      val t = cap * 10000L / shares(src)
      val other = shares.keys.find(_ != src).get
      val otherCap = mixed.filter(_.getAs[String]("source") == other)
        .head.getAs[Long]("source_token_cap")
      // t is reconstructed from a floored cap, so allow the floor slack
      // of both shares when cross-checking the ratio
      assert(math.abs(otherCap - t * shares(other) / 10000L) <= 2,
        "caps do not follow the declared share ratio")
    }
  }

  test("corpus diff classifies planted adds, removals, and edits exactly") {
    import graft.operators.Curation
    val next = docs.filter(col("doc_id") % 7 =!= 0)          // remove %7==0
      .withColumn("text", when(col("doc_id") % 7 === 1,      // edit %7==1
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 7 === 2)      // add shifted ids
        .withColumn("doc_id", col("doc_id") + lit(900000L)))
    val diff = Curation.corpusDiff(docs, next).collect()
    val byStatus = diff.groupBy(_.getAs[String]("status"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("doc_id")).toSet }
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byStatus.getOrElse("removed", Set.empty) == ids.filter(_ % 7 == 0))
    assert(byStatus.getOrElse("changed", Set.empty) == ids.filter(_ % 7 == 1))
    assert(byStatus.getOrElse("added", Set.empty)
      == ids.filter(_ % 7 == 2).map(_ + 900000L))
    assert(byStatus.getOrElse("unchanged", Set.empty)
      == ids.filter(i => i % 7 != 0 && i % 7 != 1))
    assert(diff.length == ids.size + ids.count(_ % 7 == 2), "every id classified once")
  }

  test("budget select: greedy boundary semantics, invariant to partition count") {
    import graft.operators.Curation
    val budget = 5000L
    val sel = Curation.budgetSelect(docs, col("n_chars"), budget, nPartitions = 5)
      .orderBy(col("prio").desc, col("doc_id")).collect()
    assert(sel.nonEmpty, "budget keeps at least the best doc")
    // start_tok is the exact running sum in (prio desc, doc_id) order and
    // every kept doc starts under the budget
    var cum = 0L
    sel.foreach { r =>
      assert(r.getAs[Long]("start_tok") == cum,
        s"doc ${r.getAs[Long]("doc_id")} start ${r.getAs[Long]("start_tok")} != $cum")
      assert(cum < budget, "kept a doc starting past the budget")
      cum += r.getAs[Int]("token_count")
    }
    // the selection is the PREFIX of the global priority order: the next
    // doc after the kept set (if any) starts at or past the budget
    val all = docs.select(col("doc_id"), col("n_chars").as("prio"),
        graft.functions.TextFns.tokenCount(col("text")).as("tc"))
      .collect().sortBy(r => (-r.getAs[Long]("prio"), r.getAs[Long]("doc_id")))
    if (sel.length < all.length)
      assert(cum >= budget, "stopped early: next doc would still fit")
    // repartition-count invariance: 2 partitions and 13 give the same set
    val ids5 = sel.map(_.getAs[Long]("doc_id")).toSet
    Seq(2, 13).foreach { np =>
      val ids = Curation.budgetSelect(docs, col("n_chars"), budget, np)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == ids5, s"budget selection changed with nPartitions=$np")
    }
  }
}
