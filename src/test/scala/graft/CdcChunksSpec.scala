package graft

import org.apache.spark.sql.functions._

import graft.operators.{CdcChunks, Passages}

/** Content-defined chunking: partition invariants and the
  * shift-robustness property that distinguishes it from fixed-width
  * segmentation. */
class CdcChunksSpec extends SparkSpecBase {

  private def mkText(n: Int): String =
    (0 until n).map(i => s"w${(i * 7) % 31}x$i").mkString(" ")

  test("chunks partition the document in order") {
    import spark.implicits._
    val docs = Seq((1L, mkText(100)), (2L, mkText(40))).toDF("doc_id", "text")
    val out = CdcChunks.cdcChunks(docs).cache()
    for (id <- Seq(1L, 2L)) {
      val rows = out.filter(col("doc_id") === id)
        .orderBy(col("chunk_id")).collect()
      // consecutive ids from 0
      assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
      // reassembled text equals the original
      val re = rows.map(_.getAs[String]("chunk_text")).mkString(" ")
      val orig = docs.filter(col("doc_id") === id)
        .collect().head.getString(1).toLowerCase
      assert(re == orig)
      // word counts add up
      assert(rows.map(_.getAs[Long]("n_words")).sum ==
        orig.split(" ").length.toLong)
    }
    out.unpersist()
  }

  test("prepending one word re-chunks only the head (fixed-width loses everything)") {
    import spark.implicits._
    val body = mkText(200)
    val docs = Seq((1L, body), (2L, "zzz " + body)).toDF("doc_id", "text")
    val out = CdcChunks.cdcChunks(docs).cache()
    val c1 = out.filter(col("doc_id") === 1)
      .collect().map(_.getAs[String]("chunk_text")).toSet
    val c2 = out.filter(col("doc_id") === 2)
      .collect().map(_.getAs[String]("chunk_text")).toSet
    assert(c1.size >= 5, s"want several chunks, got ${c1.size}")
    val shared = c1.intersect(c2).size
    // only the chunk(s) before the first post-edit boundary can differ
    assert(shared >= c1.size - 2,
      s"cdc shared only $shared of ${c1.size} chunks")
    // the contrast: 16-word fixed segments of the same pair share NOTHING
    val fixedShared = {
      val segs = Passages.segments(docs)
      val s1 = segs.filter(col("doc_id") === 1)
        .collect().map(_.getAs[String]("seg")).toSet
      val s2 = segs.filter(col("doc_id") === 2)
        .collect().map(_.getAs[String]("seg")).toSet
      s1.intersect(s2).size
    }
    assert(fixedShared == 0, s"fixed segmentation unexpectedly aligned")
    // duplicated chunks are marked non-first exactly once per text
    val firsts = out.filter(col("is_first")).count()
    val distinctTexts = out.select(col("chunk_text")).distinct().count()
    assert(firsts == distinctTexts)
    out.unpersist()
  }

  test("aHash is invariant to small pixel noise and flips on inversion") {
    import graft.operators.Multimodal
    def img(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val r = im.getRaster
      for (y <- 0 until 32; x <- 0 until 32; c <- 0 until 3)
        r.setSample(x, y, c, math.max(0, math.min(255, f(x, y))))
      im
    }
    // left half dark, right half bright
    val base = img((x, _) => if (x < 16) 40 else 200)
    // ±3 deterministic pixel noise: same threshold verdicts
    val noisy = img((x, y) => (if (x < 16) 40 else 200) + ((x + y) % 7) - 3)
    val inverted = img((x, _) => if (x < 16) 200 else 40)
    val hb = Multimodal.ahashOf(base)
    assert(Multimodal.ahashOf(noisy) == hb)
    val hi = Multimodal.ahashOf(inverted)
    assert((hi._1, hi._2) != ((hb._1, hb._2)))
    // popcount reconciles with the halves
    assert(java.lang.Long.bitCount(hb._1) + java.lang.Long.bitCount(hb._2)
      == hb._3)
    // half the tile is above the mean in this pattern
    assert(hb._3 == 32)
  }

  test("banded aHash pairs equal the driver-side brute force (pigeonhole completeness)") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sf)
    val blocked = Multimodal.ahashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = Multimodal.ahashes(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, loA, hiA) <- hashes
      (b, loB, hiB) <- hashes
      if a < b
      ham = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
      if ham <= Multimodal.AhMaxHamming
    } yield (a, b, ham)).toSet
    assert(blocked == brute)
    assert(blocked.nonEmpty, "fixture cycle should produce real image dups")
  }

  test("hash groups partition the corpus; members share the rep's hash") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sf)
    val groups = Multimodal.ahashGroups(docs).collect()
    assert(groups.map(_.getAs[Long]("n_members")).sum == docs.count())
    // representatives are distinct and belong to their own group's hash
    val reps = groups.map(_.getAs[Long]("representative"))
    assert(reps.distinct.length == reps.length)
    val hashOf = Multimodal.ahashes(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    groups.foreach { g =>
      assert(hashOf(g.getAs[Long]("representative")) ==
        ((g.getAs[Long]("ahash_lo"), g.getAs[Long]("ahash_hi"))))
    }
  }

  test("class weights are exact inverse-frequency surrogates") {
    import spark.implicits._
    val docs = (Seq.fill(6)("en") ++ Seq.fill(3)("de") ++ Seq.fill(1)("fr"))
      .zipWithIndex.map { case (l, i) => (i.toLong, s"text $i", l) }
      .toDF("doc_id", "text", "lang")
    val w = CdcChunks.classWeights(docs, "lang").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // N=10, K=3: en → ⌊10000/18⌋=555, de → ⌊10000/9⌋=1111, fr → ⌊10000/3⌋=3333
    assert(w == Map("en" -> ((6L, 555L)), "de" -> ((3L, 1111L)),
      "fr" -> ((1L, 3333L))))
  }
}
