package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Misra-Gries-candidate exact top-k: equality with the brute-force
  * aggregation, survival under tiny summaries (fallback path), and
  * the bounded-summary invariant. */
class HeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  private def bruteTopK(docs: org.apache.spark.sql.DataFrame, k: Int) =
    docs.select(explode(graft.functions.TextFns.words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k).collect().toSeq

  test("sketch-candidate top-k equals the brute-force aggregation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val mg = TextAnalysis.heavyHitters(docs, k = 20).collect().toSeq
    assert(mg == bruteTopK(docs, 20))
  }

  test("a summary far too small still returns the exact answer (fallback)") {
    // Zipf-ish planted corpus with many singletons; summarySize=4 cannot
    // hold the candidates, so the guarantee check must trip the fallback
    val docs = (1L to 50L).flatMap { i =>
      val common = Seq.fill(5)(s"hot${i % 7}")
      val noise = Seq(s"rare$i", s"one$i", s"x$i")
      Seq((i, (common ++ noise).mkString(" ")))
    }.toDF("doc_id", "text")
    val mg = TextAnalysis.heavyHitters(docs, k = 10, summarySize = 4)
      .collect().toSeq
    assert(mg == bruteTopK(docs, 10))
  }

  test("repeat-heavy stream: frequent terms dominate with a small summary") {
    val docs = (1L to 30L).map(i =>
      (i, (Seq.fill(20)("alpha") ++ Seq.fill(10)("beta") ++
        Seq(s"noise$i")).mkString(" "))).toDF("doc_id", "text")
    val top = TextAnalysis.heavyHitters(docs, k = 2, summarySize = 8).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("alpha", "beta"))
    assert(top(0).getLong(1) == 600L && top(1).getLong(1) == 300L)
  }
}
