package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Phrase, Spans}

/** Substring-span dedup and positional phrase search over hand-built
  * corpora with known repeat structure. */
class SpanPhraseSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def row(df: DataFrame, id: Long): (Long, Long, String) = {
    val r = df.filter(col("doc_id") === id).collect().head
    (r.getAs[Long]("n_words"), r.getAs[Long]("removed_words"),
      r.getAs[String]("cleaned_text"))
  }

  test("cross-doc 8-word repeat drops from the second doc only") {
    val d = docs(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 u1 u2",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2")
    val out = Spans.substringSpanDedup(d)
    assert(row(out, 1L) == ((10L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8 u1 u2")))
    assert(row(out, 2L) == ((10L, 8L, "x1 x2")))
  }

  test("a 9-word shared run removes all 9 words (maximal span, not 8)") {
    val d = docs(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9",
      2L -> "a1 w1 w2 w3 w4 w5 w6 w7 w8 w9 a2")
    val out = Spans.substringSpanDedup(d)
    assert(row(out, 2L) == ((11L, 9L, "a1 a2")))
  }

  test("docs shorter than the window and sub-window repeats are untouched") {
    val d = docs(
      1L -> "a b c d e f g",          // 7 words < K
      2L -> "a b c d e f g tail one") // shares only a 7-word run
    val out = Spans.substringSpanDedup(d)
    assert(row(out, 1L)._2 == 0L)
    assert(row(out, 2L)._2 == 0L)
  }

  test("within-doc repeat keeps the first occurrence") {
    val d = docs(1L -> "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8")
    val (n, rem, cleaned) = row(Spans.substringSpanDedup(d), 1L)
    assert(n == 16L && rem == 8L)
    assert(cleaned == "w1 w2 w3 w4 w5 w6 w7 w8")
  }

  test("digest-keyed span dedup equals the raw-key form on the fixture") {
    val docs = Tables.documents(spark, sf)
    val raw = Spans.substringSpanDedup(docs).collect().map(_.toString).sorted
    val dig = Spans.substringSpanDedup(docs, digestKeys = true)
      .collect().map(_.toString).sorted
    assert(raw.sameElements(dig) && raw.nonEmpty)
  }

  test("windows() emits stride-1 positions and nothing for short docs") {
    val d = docs(1L -> "a b c d e f g h i", 2L -> "x y")
    val w = Spans.windows(d).collect()
    assert(w.forall(_.getLong(0) == 1L))
    assert(w.map(_.getInt(1)).sorted.toSeq == Seq(0, 1))
  }

  test("phrase hits count overlapping occurrences") {
    val d = docs(1L -> "a a a a", 2L -> "a a b a")
    val hits = Phrase.phraseHits(d, Seq("a", "a", "a"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_hits")).toMap
    assert(hits == Map(1L -> 2L)) // starts 0 and 1; doc 2 has none
  }

  test("top trigram picks max count with lexicographic tiebreak") {
    // "b c d" and "a c d" both appear twice → lexicographically smaller wins
    val d = docs(
      1L -> "b c d x a c d",
      2L -> "b c d y a c d")
    assert(Phrase.topTrigram(d) == Seq("a", "c", "d"))
  }

  test("multi-term phrase joins consecutive positions only") {
    val d = docs(
      1L -> "the quick fox jumps",
      2L -> "the quick brown fox",
      3L -> "quick fox the jumps")
    val hits = Phrase.phraseHits(d, Seq("the", "quick", "fox"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_hits")).toMap
    assert(hits == Map(1L -> 1L))
  }
}
