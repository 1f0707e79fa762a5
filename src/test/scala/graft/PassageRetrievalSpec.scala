package graft

import org.apache.spark.sql.functions._

import graft.operators.{Passages, Retrieval}

/** Semantics tests for passage-level dedup and BM25 retrieval on planted
  * mini-corpora (the fixture-scale oracle gate covers the full corpus). */
class PassageRetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("passage dedup drops a cross-doc repeated passage from the later doc only") {
    val boiler = (1 to Passages.SegWords).map(i => s"b$i").mkString(" ")
    val uniqueA = (1 to Passages.SegWords).map(i => s"a$i").mkString(" ")
    val uniqueB = (1 to Passages.SegWords).map(i => s"c$i").mkString(" ")
    val out = Passages.passageDedup(corpus(
      1L -> s"$boiler $uniqueA",
      2L -> s"$boiler $uniqueB")).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_segs") == 2 && out(0).getAs[Long]("kept_segs") == 2)
    assert(out(0).getAs[String]("cleaned_text") == s"$boiler $uniqueA")
    // doc 2 loses the boilerplate passage but keeps its unique tail
    assert(out(1).getAs[Long]("kept_segs") == 1)
    assert(out(1).getAs[String]("cleaned_text") == uniqueB)
  }

  test("passage dedup keeps first occurrence by (doc_id, pos) within a doc too") {
    val seg = (1 to Passages.SegWords).map(i => s"x$i").mkString(" ")
    val out = Passages.passageDedup(corpus(1L -> s"$seg $seg")).collect()(0)
    assert(out.getAs[Long]("n_segs") == 2)
    assert(out.getAs[Long]("kept_segs") == 1)
    assert(out.getAs[String]("cleaned_text") == seg)
  }

  test("passage dedup: an all-duplicate doc reassembles to empty text") {
    val seg = (1 to Passages.SegWords).map(i => s"y$i").mkString(" ")
    val out = Passages.passageDedup(corpus(1L -> seg, 2L -> seg))
      .orderBy("doc_id").collect()
    assert(out(1).getAs[Long]("kept_segs") == 0L)
    assert(out(1).getAs[String]("cleaned_text") == "")
  }

  test("chunks: overlap stitches back to the original and tail is never a runt") {
    // 150 words, width 64 / stride 48 → chunks at 0/48/96 and the count
    // formula stops there: 1 + ceil((150-64)/48) = 3
    val words = (1 to 150).map(i => s"w$i")
    val out = Passages.chunks(corpus(1L -> words.mkString(" ")))
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(64L, 64L, 54L))
    // each chunk is exactly the slice starting at i*stride
    out.zipWithIndex.foreach { case (r, i) =>
      val expect = words.slice(i * Passages.ChunkStride,
        i * Passages.ChunkStride + Passages.ChunkWords).mkString(" ")
      assert(r.getAs[String]("chunk_text") == expect)
    }
    // consecutive chunks overlap by width − stride words
    val o01 = out(0).getAs[String]("chunk_text").split(" ").toSeq
      .intersect(out(1).getAs[String]("chunk_text").split(" ").toSeq)
    assert(o01.length == Passages.ChunkWords - Passages.ChunkStride)
  }

  test("chunks: short doc yields one chunk; tail ≥ width − stride + 1 words") {
    val short = Passages.chunks(corpus(1L -> "a b c")).collect()
    assert(short.length == 1 && short(0).getAs[Long]("n_tokens") == 3L)
    // worst-case tail: n = width + k*stride + 1 → tail = width − stride + 1
    val n = Passages.ChunkWords + Passages.ChunkStride + 1
    val tail = Passages.chunks(corpus(1L -> (1 to n).map("t" + _).mkString(" ")))
      .orderBy("chunk_id").collect().last
    assert(tail.getAs[Long]("n_tokens") == Passages.ChunkWords - Passages.ChunkStride + 1)
  }

  test("bm25 ranks the term-dense short doc above a diluted long one") {
    // doc 1: query term 'spark' 3 times in 4 words; doc 2: once in 12 words;
    // doc 3: no query terms at all (must be absent from the result)
    val out = Retrieval.bm25TopK(corpus(
      1L -> "spark spark spark other",
      2L -> "spark one two three four five six seven eight nine ten eleven",
      3L -> "nothing relevant here at all")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("bm25 sums per-term partials: multi-term docs outrank single-term ties") {
    val out = Retrieval.bm25TopK(corpus(
      1L -> "spark join merge pad",
      2L -> "spark pad pad pad",
      3L -> "pad pad pad pad")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("bm25 idf: a rarer term contributes more than a common one at equal tf") {
    // 'join' appears in 1 of 4 docs, 'spark' in 3 of 4 — same tf/dl shape
    val out = Retrieval.bm25TopK(corpus(
      1L -> "join pad",
      2L -> "spark pad",
      3L -> "spark other",
      4L -> "spark words")).collect()
    assert(out.head.getLong(0) == 1L, "rare-term doc should rank first")
  }

  test("persisted inverted index serves identical bm25 results") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.writeIndex(docs, dir)
    val inline = Retrieval.bm25TopK(docs).collect().toSeq
    val served = Retrieval.bm25FromIndex(spark, dir).collect().toSeq
    assert(inline.nonEmpty && served == inline)
  }

  test("index postings are term-range-partitioned: query filter skips files") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("bm25skip").toString
    Retrieval.writeIndex(docs, dir, nFiles = 8)
    // per-file term ranges must be disjoint — the precondition for
    // min/max file skipping on a term predicate
    val ranges = spark.read.parquet(s"$dir/postings")
      .select(input_file_name().as("f"), col("term"))
      .groupBy("f").agg(min("term").as("lo"), max("term").as("hi"))
      .orderBy("lo").collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(2) <= b.getString(1),
          s"overlapping term ranges: ${a.getString(2)} vs ${b.getString(1)}")
      case _ =>
    }
  }
}
