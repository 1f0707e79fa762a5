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
}
