package graft

import org.apache.spark.sql.functions._

import graft.operators.{Matryoshka, Similarity}

class MatryoshkaSpec extends SparkSpecBase {

  test("full-width prefix ranking equals the brute-force kernel ranking") {
    val emb = Tables.embeddings(spark, sf)
    val viaPrefix = Matryoshka.topKPrefix(emb, 64)
    val direct = Similarity
      .bruteForceTopKNative(emb, k = Matryoshka.K, nQueries = Matryoshka.NQueries)
      .select(col("query_id"), col("neighbor_id"))
    assert(viaPrefix.exceptAll(direct).isEmpty && direct.exceptAll(viaPrefix).isEmpty)
  }

  test("recall report: one row per prefix, recall within [0, 10000] bp") {
    val rows = Matryoshka.prefixRecall(Tables.embeddings(spark, sf)).collect()
    assert(rows.map(_.getInt(0)).toSeq == Matryoshka.Prefixes)
    rows.foreach { r =>
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0L && bp <= 10000L, r.toString)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("possible"))
    }
  }
}
