package graft

import org.apache.spark.sql.functions._

import graft.operators.SparseSim

/** IDF-weighted shingle cosine top-k: hand-checked geometry on a planted
  * corpus plus fixture-level invariants. */
class SparseSimSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact duplicates score cosine 1.0 and rare overlap outranks boilerplate overlap") {
    // docs 1/2 identical; 3 shares a RARE trigram with 1; 4 shares only
    // the common boilerplate trigram every doc carries; 5 is unrelated
    val boiler = "the quick brown" // df 5 shingle — still <= Cap, weight LOW
    val rows = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler alpha beta gamma delta"),
      (3L, s"$boiler zz alpha beta gamma yy"),
      (4L, s"$boiler one two three four"),
      (5L, s"$boiler five six seven eight")).toDF("doc_id", "text")
    val got = SparseSim.sparseTopK(rows).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getInt(4))))
      .toMap
    assert(got((1L, 2L))._1 == 1.0, s"exact dup cosine ${got((1L, 2L))}")
    assert(got((1L, 2L))._2 == 1 && got((2L, 1L))._2 == 1)
    // doc 3 shares 'alpha beta gamma' (rare, df=3) with 1 — must outrank
    // doc 4, which shares only the df=5 boilerplate head
    val r13 = got((1L, 3L)); val r14 = got((1L, 4L))
    assert(r13._1 > r14._1,
      s"rare overlap ${r13._1} must outrank boilerplate overlap ${r14._1}")
    // cosine is symmetric where both directions are reported
    got.foreach { case ((a, b), (c, _)) =>
      got.get((b, a)).foreach(o => assert(o._1 == c, s"asymmetric $a,$b")) }
  }

  test("persisted postings index serves the inline results for the query batch") {
    val docs = Tables.documents(spark, sf)
    val idx = SparseSim.buildPostings(docs)
    // the index is postings-only: no text column ever reaches the scan
    // (sh_id is the integer join surrogate for the shingle string)
    assert(idx.schema.fieldNames.toSet == Set("doc_id", "sh", "sh_id", "wgt", "n2"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sparse-idx").toString
    idx.write.mode("overwrite").parquet(dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))
    val served = SparseSim.sparseTopKFromPostings(
      spark.read.parquet(dir), SparseSim.K, SparseSim.NQueries)
      .collect().map(key).toSet
    val inline = SparseSim.sparseTopK(docs)
      .filter(col("doc_id") < SparseSim.NQueries)
      .collect().map(key).toSet
    assert(served == inline,
      "postings index must serve the inline top-k for the query batch")
    assert(served.nonEmpty)
  }

  test("sh_id is content-derived: equals xxhash64(sh), stable across rebuilds and partitionings") {
    // ADVICE r12 determinism contract: a positional surrogate is only
    // stable per (partition, row-offset) and can diverge under stage
    // retry before the checkpoint materializes; the content hash is
    // identical under ANY recompute or repartitioning
    val docs = Tables.documents(spark, sf).limit(300)
    val p1 = SparseSim.buildPostings(docs)
    assert(p1.filter(xxhash64(col("sh")) =!= col("sh_id")).count() == 0,
      "sh_id must be xxhash64 of the shingle content")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("sh", "sh_id").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m1 = ids(p1)
    val m2 = ids(SparseSim.buildPostings(docs.repartition(7)))
    assert(m1 == m2, "sh_id mapping must not depend on partitioning")
  }

  test("fixture invariants: bounded cosine, dense ranks, k-limited") {
    val out = SparseSim.qSparseTopK(spark, sf).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rows) =>
      val ranks = rows.map(_.getInt(4)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"doc $d ranks $ranks not dense")
      assert(ranks.size <= SparseSim.K)
      rows.foreach { r =>
        val c = r.getDouble(3)
        assert(c > 0.0 && c <= 1.0 + 1e-12, s"cosine out of range: $c")
        assert(r.getLong(2) >= 1L, "reported pair with zero shared shingles")
      }
      // neighbors sorted by (cosine desc, neighbor) — the declared order
      val sorted = rows.sortBy(_.getInt(4)).toSeq
      sorted.sliding(2).foreach {
        case Seq(hi, lo) =>
          assert(hi.getDouble(3) > lo.getDouble(3) ||
            (hi.getDouble(3) == lo.getDouble(3) && hi.getLong(1) < lo.getLong(1)))
        case _ =>
      }
    }
  }
}
