package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SafeSplit, TextAnalysis}

/** Leakage-safe split: the property the operator exists for, plus
  * distribution sanity. */
class SafeSplitSpec extends SparkSpecBase {

  lazy val docs = Tables.documents(spark, sf)
  lazy val assigned = SafeSplit.clusterSafeSplit(docs).cache()

  test("no near-dup pair straddles splits; the plain hash split does leak here") {
    val pairs = Dedup.shingleJaccardPairs(docs, 0.8)
      .select(col("doc_a"), col("doc_b"))
    assert(pairs.count() > 0, "fixture has no near-dup pairs — test vacuous")
    val s = assigned.select(col("doc_id"), col("split"))
    val straddle = pairs
      .join(s.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0, "near-dup pair crossed a split boundary")
    // the guard is not vacuous: the PLAIN per-doc hash split leaks on
    // this same fixture (if it didn't, cluster-keying would be untestable)
    val plain = TextAnalysis.withSplit(docs).select(col("doc_id"), col("split"))
    val plainStraddle = pairs
      .join(plain.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(plain.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(plainStraddle.count() > 0,
      "plain split doesn't leak on this fixture — property unexercised")
  }

  test("every doc assigned exactly once; singletons keep their own hash bucket") {
    assert(assigned.count() == docs.count())
    assert(assigned.groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0)
    // singleton docs (rep == self) must match the plain split exactly —
    // cluster-keying changes ONLY clustered docs
    val plain = TextAnalysis.withSplit(docs)
      .select(col("doc_id"), col("split").as("plain_split"))
    val singles = assigned.filter(col("rep_id") === col("doc_id"))
      .join(plain, "doc_id")
    assert(singles.filter(col("split") =!= col("plain_split")).count() == 0)
    // all three splits are populated at fixture scale
    assert(assigned.select(col("split")).distinct().count() == 3)
  }
}
