package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** PQ ANN properties on the fixture embeddings: recall against the exact
  * brute-force baseline, compression shape, and determinism. */
class PqSpec extends SparkSpecBase {

  lazy val emb = Tables.embeddings(spark, sf)
  lazy val books = Pq.trainCodebooks(emb, 64)

  test("codes are M byte-sized indices — the 32x compression is real") {
    val codes = Pq.encode(emb, books, 64).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == Pq.M)
      assert(cs.forall(c => c >= 0 && c < Pq.K))
    }
  }

  test("ADC recall@5 against exact brute force clears 0.6; re-rank scores are exact") {
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, k, nQueries = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.pqTopKWith(emb, books, k, nQueries = 50).collect()
    val got = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall@5 = $recall")
    // the cosine column is computed from TRUE vectors, not reconstructions:
    // for overlapping pairs it must equal the brute-force cosine bit-for-bit
    val exactCos = Similarity.bruteForceTopK(emb, k, nQueries = 50)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("PQ top-k is deterministic across runs (fixed seed, pinned tiebreaks)") {
    val a = Pq.pqTopKWith(emb, books, 5, 20).collect().toSeq
    val b = Pq.pqTopKWith(emb, books, 5, 20).collect().toSeq
    assert(a == b)
  }

  test("persisted code table serves the identical top-k (encode-once layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-codes").toString
    val booksW = Pq.writeCodes(emb, dir)
    val codes = spark.read.parquet(dir)
    // the serving scan reads 8 ints per vector, never an embedding
    assert(codes.schema.fieldNames.toSet == Set("vec_id", "codes"))
    val served = Pq.pqTopKFromCodes(codes, emb, booksW, 5, 20).collect().toSeq
    val inline = Pq.pqTopKWith(emb, booksW, 5, 20).collect().toSeq
    assert(served == inline, "persisted codes must serve the inline-encode results")
  }

  test("IVFPQ with nProbe = cells recovers the full ADC sweep exactly") {
    val cents = graft.operators.Ivf.trainCentroids(emb)
    val full = Pq.pqTopKWith(emb, books, 5, 20).collect().toSeq
    val ivfpq = Pq.ivfPqTopKWith(emb, cents, books, 5, 20,
      nProbe = graft.operators.Ivf.Cells).collect().toSeq
    assert(ivfpq == full,
      "cell pruning with all cells probed must be a no-op")
  }

  test("persisted IVFPQ layout partition-prunes on cell and serves the inline results") {
    import graft.operators.Ivf
    val cents = Ivf.trainCentroids(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Pq.writeCodesClustered(emb, dir, cents, books)
    val codes = spark.read.parquet(dir)
    // the hot table holds 8 ints + the partition cell per vector — never
    // an embedding
    assert(codes.schema.fieldNames.toSet == Set("vec_id", "codes", "cell"))
    // files read ∝ nProbe: a small query batch's probe-cell union is a
    // strict subset of the cells (3 queries × nProbe < 16 here; 20
    // queries happen to union to all 16 at fixture scale), and the scan
    // must carry a cell PartitionFilter (Catalyst prunes the rest)
    val probed = emb.filter(col("vec_id") < 3)
      .select(explode(Ivf.probeCells(col("embedding"), cents, Ivf.NProbe)
        .getField("cell")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(probed.size < Ivf.Cells,
      s"fixture probes every cell (${probed.size}) — pruning unexercised")
    val served3 = Pq.ivfPqTopKFromCodes(codes, emb, cents, books, 5, 3)
    val plan = served3.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"serving scan did not partition-prune on cell:\n$plan")
    assert(served3.collect().toSeq ==
      Pq.ivfPqTopKWith(emb, cents, books, 5, 3).collect().toSeq)
    val served = Pq.ivfPqTopKFromCodes(codes, emb, cents, books, 5, 20)
    val inline = Pq.ivfPqTopKWith(emb, cents, books, 5, 20).collect().toSeq
    assert(served.collect().toSeq == inline,
      "persisted IVFPQ layout must serve the inline-encode results")
  }

  test("PQ code-table append: settled files untouched; probe equals a full rebuild") {
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    // initial build on the first half trains the books; the second half
    // arrives later as a maintenance batch — frozen books, no retrain
    val booksW = Pq.writeCodes(first, dir)
    val before = spark.read.parquet(dir).inputFiles.toSet
    Pq.appendCodes(rest, dir, booksW)
    val after = spark.read.parquet(dir).inputFiles.toSet
    assert(before.subsetOf(after), "append rewrote settled files")
    assert(after.size > before.size)
    // from-scratch encode of the union with the SAME books
    val dir2 = java.nio.file.Files.createTempDirectory("graft-pq-reb").toString
    Pq.appendCodes(emb, dir2, booksW)
    def served(d: String) =
      Pq.pqTopKFromCodes(spark.read.parquet(d), emb, booksW, 5, 20)
        .collect().toSeq
    assert(served(dir) == served(dir2),
      "appended code table must serve exactly like a full rebuild")
  }

  test("IVFPQ layout append: batches land in their cells; untouched cells keep files") {
    import graft.operators.Ivf
    val cents = Ivf.trainCentroids(emb)
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    Pq.writeCodesClustered(first, dir, cents, books)
    val before = spark.read.parquet(dir).inputFiles.toSet
    Pq.appendCodesClustered(rest, dir, cents, books)
    val after = spark.read.parquet(dir).inputFiles.toSet
    assert(before.subsetOf(after), "append rewrote settled cell files")
    assert(after.size > before.size)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivfpq-reb").toString
    Pq.appendCodesClustered(emb, dir2, cents, books)
    def served(d: String) =
      Pq.ivfPqTopKFromCodes(spark.read.parquet(d), emb, cents, books, 5, 20)
        .collect().toSeq
    assert(served(dir) == served(dir2),
      "appended IVFPQ layout must probe exactly like a full rebuild")
  }

  test("IVFPQ at nProbe = 6 keeps useful recall on a 2.7x-pruned scan") {
    val cents = graft.operators.Ivf.trainCentroids(emb)
    val exact = Similarity.bruteForceTopK(emb, 5, nQueries = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Pq.ivfPqTopKWith(emb, cents, books, 5, nQueries = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.35, s"IVFPQ recall@5 = $recall")
  }
}
