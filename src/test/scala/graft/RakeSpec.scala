package graft

import org.apache.spark.sql.functions._

import graft.operators.Rake

/** RAKE keyword extraction on corpora with hand-computed deg/freq. */
class RakeSpec extends SparkSpecBase {

  private def run(rows: (Long, String)*) = {
    import spark.implicits._
    Rake.rakeKeywords(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[String]("phrase") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_occurrences"),
          r.getAs[Double]("score"))).toMap
  }

  test("deg/freq scoring on a two-phrase doc") {
    // runs: [red apple], [green apple] (the/and/is are stopwords)
    // freq: red 1, apple 2, green 1; deg: red 2, apple 4, green 2
    // wscore: all 2.0 → each phrase scores 4.0
    val out = run(1L -> "the red apple and green apple")
    assert(out("red apple") == ((2L, 1L, 4.0)))
    assert(out("green apple") == ((2L, 1L, 4.0)))
  }

  test("stopword-only gaps split runs; longer runs outrank short ones") {
    // "data quality checks" (len 3) members appear once each: deg 3,
    // freq 1 → wscore 3 each → phrase 9.0; "data" alone in another doc
    // raises freq(data)=2, deg(data)=4 → wscore 2 → phrase 2.0, and the
    // 3-run rescores to 2+3+3 = 8.0
    val out = run(
      1L -> "data quality checks",
      2L -> "is data of")
    assert(out("data quality checks")._3 == 8.0)
    assert(out("data") == ((1L, 1L, 2.0)))
  }

  test("runs longer than the cap are dropped entirely") {
    val out = run(1L -> "one two three four five", 2L -> "is one two")
    assert(!out.keySet.exists(_.contains("three")))
    assert(out.contains("one two"))
  }

  test("repeated phrase counts occurrences once per instance") {
    val out = run(1L -> "hot take is hot take", 2L -> "hot take")
    // all instances identical → one distinct phrase, 3 occurrences
    assert(out("hot take")._2 == 3L)
    assert(out.size == 1)
  }

  test("fixture corpus yields a full deterministic top-25") {
    val a = Rake.qRakeKeywords(spark, sf).collect()
    val b = Rake.qRakeKeywords(spark, sf).collect()
    assert(a.length == 25)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // ranks are 1..25 in order, scores non-increasing
    assert(a.map(_.getAs[Int]("rank")).toSeq == (1 to 25))
    val scores = a.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }
}
