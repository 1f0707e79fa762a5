package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup, TextAnalysis}

/** Incremental cross-snapshot dedup semantics: planted batch outcomes for
  * every status, and equivalence of the LSH-candidate near leg with the
  * exact pair operator over the same split. */
class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted batch: exact copy, near edit, and novel doc classified") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearEdit = ((1 to 39).map(i => s"w$i") :+ "CHANGED").mkString(" ")
    val novel = (1 to 40).map(i => s"z$i").mkString(" ")
    val existing = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, nearEdit), (12L, novel))
      .toDF("doc_id", "text")
    val out = IncrementalDedup.incrementalDedup(existing, batch)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq == Seq(10L -> "exact_dup", 11L -> "near_dup", 12L -> "kept"))
  }

  test("near leg equals exact cross-split jaccard pairs on the fixture") {
    val tagged = TextAnalysis.withSplit(Tables.documents(spark, sf))
    val existing = tagged.filter(col("split") === "train")
    val batch = tagged.filter(col("split") =!= "train")
    // brute truth: batch docs exact-jaccard-paired with any existing doc
    // (union pair operator, filtered to cross-split pairs)
    val pairs = Dedup.shingleJaccardPairs(Tables.documents(spark, sf), 0.8)
    val exIds = existing.select("doc_id").collect().map(_.getLong(0)).toSet
    val bIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val expectNear = pairs.collect().flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      Seq(a -> b, b -> a)
    }.collect { case (x, y) if bIds(x) && exIds(y) => x }.toSet
    val got = IncrementalDedup.incrementalDedup(existing, batch).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == bIds)
    val gotNear = got.collect { case (id, "near_dup") => id }.toSet
    // fixture has no cross-split exact dups, so near must match exactly
    assert(!got.values.exists(_ == "exact_dup"))
    assert(gotNear == expectNear,
      s"missed ${expectNear -- gotNear}, extra ${gotNear -- expectNear}")
  }
}
