package graft

import org.apache.spark.sql.functions._

import graft.operators.{Colloc, Pairs}

/** Hard-negative mining, epoch shuffle, and PMI collocation specs. */
class PairsCollocSpec extends SparkSpecBase {

  test("hard negatives never share the query label and match driver-side math") {
    val emb = Tables.embeddings(spark, sf)
    val out = Pairs.hardNegatives(emb, k = 5, nQueries = 10).collect()
    assert(out.length == 50)
    assert(out.forall(r => r.getInt(1) != r.getInt(3)))
    // independent driver-side recomputation
    val all = emb.select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(_.toDouble)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val byQ = out.groupBy(_.getLong(0))
    for ((qid, rows) <- byQ) {
      val (_, qlab, qe) = all.find(_._1 == qid).get
      val expect = all.filter(_._2 != qlab)
        .map { case (id, _, ce) => (id, dot(qe, ce) / (nrm(qe) * nrm(ce))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val got = rows.sortBy(_.getInt(5)).map(_.getLong(2)).toSeq
      assert(got == expect, s"query $qid")
    }
  }

  test("epoch shuffle is a per-epoch permutation, differs across epochs, deterministic") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val out = Pairs.epochShuffle(docs, epochs = 2, nPartitions = 4).cache()
    for (e <- 0 until 2) {
      val pos = out.filter(col("epoch") === e)
        .select(col("position")).collect().map(_.getLong(0)).sorted.toSeq
      assert(pos == (1L to n).toSeq, s"epoch $e not a permutation")
    }
    val order0 = out.filter(col("epoch") === 0).orderBy(col("position"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val order1 = out.filter(col("epoch") === 1).orderBy(col("position"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(order0 != order1, "epochs produced the same order")
    out.unpersist()
    // partition-count invariance + determinism
    val again = Pairs.epochShuffle(docs, epochs = 2, nPartitions = 9)
      .orderBy(col("epoch"), col("position"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val base = Pairs.epochShuffle(docs, epochs = 2, nPartitions = 4)
      .orderBy(col("epoch"), col("position"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == base)
  }

  test("phrase serving equals the inline path row-for-row") {
    val a = graft.operators.Phrase.qPhraseSearch(spark, sf)
      .collect().map(_.toString).toSeq
    val b = graft.operators.Phrase.qPhraseSearchServing(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("source interleave: every K consecutive positions see every source once") {
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.Pairs.interleaveSources(docs)
      .orderBy(col("position")).collect()
      .map(r => (r.getLong(2), r.getString(1)))
    val k = docs.select(col("source")).distinct().count().toInt
    // positions are distinct; within any aligned stripe each source
    // appears at most once (the tail stripe may be partial)
    assert(out.map(_._1).distinct.length == out.length)
    out.groupBy(_._1 / k).foreach { case (_, stripe) =>
      val srcs = stripe.map(_._2)
      assert(srcs.distinct.length == srcs.length)
    }
    assert(out.length == docs.count())
  }

  test("pmi ranks exclusive pairs above frequent-but-promiscuous ones") {
    import spark.implicits._
    val docs = (
      (1 to 5).map(i => (i.toLong, "north pole")) ++
        (6 to 11).map(i => (i.toLong, "big cat big dog big cow")))
      .toDF("doc_id", "text")
    val out = Colloc.pmiBigrams(docs, minCount = 5, k = 10).collect()
    val top = out.head
    assert(top.getAs[String]("bigram") == "north pole")
    // N = 5·2 + 6·6 = 46 words; score = ⌊5·46·1000 / (5·5)⌋
    assert(top.getAs[Long]("pmi_score") == 9200L)
    val bigCat = out.find(_.getAs[String]("bigram") == "big cat").get
    // c(big)=18, c(cat)=6 → ⌊6·46·1000 / 108⌋
    assert(bigCat.getAs[Long]("pmi_score") == 2555L)
  }

  test("pmi min-count screens out one-off pairs") {
    import spark.implicits._
    val docs = ((1 to 5).map(i => (i.toLong, "alpha beta")) :+
      (6L -> "rare pair")).toDF("doc_id", "text")
    val bigrams = Colloc.pmiBigrams(docs, minCount = 5, k = 10)
      .collect().map(_.getAs[String]("bigram")).toSet
    assert(bigrams == Set("alpha beta"))
  }
}
