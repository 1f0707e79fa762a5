package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Forget, Phrase, Retrieval, SparseSim}
import graft.operators.Forget.DerivedRef

/** Erasure propagation to derived serving artifacts (VERDICT r12
  * item 1): after the sweep, zero subject rows AND zero subject content
  * in every artifact; untouched partitions/files byte-identical; the
  * report reconciles; re-running is a no-op. */
class DerivedForgetSpec extends SparkSpecBase {
  import spark.implicits._

  private def mtimes(root: String): Map[String, Long] = {
    val s = Files.walk(Paths.get(root))
    try s.filter(p => p.toString.endsWith(".parquet"))
      .toArray.map(_.asInstanceOf[Path])
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    finally s.close()
  }

  test("derived sweep: subjects vanish from every artifact, content included; settled units byte-identical; idempotent") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0L until 30L).map { id =>
      // a per-doc sentinel token makes content-level erasure checkable:
      // after the sweep no artifact value may carry a subject's sentinel
      val text = (0 until 8).map(j => words(((id + j) % 6).toInt))
        .mkString(" ") + s" zzsentinel${id}zz"
      (id, text, "en", s"src${id % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // 16 and 17 are RANGE-adjacent: they share one range-bucketed sparse
    // file (surgical per-file path), while their words scatter across
    // every bm25/phrase range file (full-rewrite dispatch) — one fixture
    // exercises both rewrite plans
    val subjects = Seq(16L, 17L).toDF("doc_id")

    val tmp = Files.createTempDirectory("graft-derived-forget").toString
    docs.write.partitionBy("source").parquet(s"$tmp/documents")
    // 4 range-bucketed files so subjects cluster and some files provably
    // hold no subject (the doc-clustered layout the surgical path serves)
    SparseSim.buildPostings(docs).repartitionByRange(4, col("doc_id"))
      .write.parquet(s"$tmp/sparse_postings")
    Retrieval.writeIndex(docs, s"$tmp/bm25_index")
    Phrase.writePositionalIndex(docs, s"$tmp/phrase_index")
    // cell-partitioned code-table stand-in (the ivf/ivfpq layout shape):
    // subjects 16 and 17 land in cells 0 and 1; cells 2/3 stay settled
    (0L until 30L).map(id => (id, (id % 4).toInt, id * 11))
      .toDF("vec_id", "cell", "code")
      .write.partitionBy("cell").parquet(s"$tmp/codes")

    val sparseBefore = spark.read.parquet(s"$tmp/sparse_postings")
      .withColumn("f", input_file_name())
    val untouchedSparseFiles = sparseBefore.groupBy(col("f"))
      .agg(max(expr("CASE WHEN doc_id IN (16, 17) THEN 1 ELSE 0 END")).as("hit"))
      .filter(col("hit") === 0).collect().map(_.getString(0))
    assert(untouchedSparseFiles.nonEmpty, "fixture: no subject-free sparse file")
    // the sparse layout must take the SURGICAL path (clustered subjects):
    // affected files stay a strict minority
    assert((4 - untouchedSparseFiles.length) * 2 < 4,
      s"subjects not clustered: ${4 - untouchedSparseFiles.length} of 4 files affected")
    val removedExpected = Map(
      "primary_documents" -> 2L,
      "sparse_postings" -> sparseBefore.filter(col("doc_id").isin(16L, 17L)).count(),
      "bm25_postings" -> spark.read.parquet(s"$tmp/bm25_index/postings")
        .filter(col("doc_id").isin(16L, 17L)).count(),
      "bm25_doclen" -> 2L,
      "phrase_index" -> spark.read.parquet(s"$tmp/phrase_index")
        .filter(col("doc_id").isin(16L, 17L)).count(),
      "codes" -> 2L)
    val mtBefore = mtimes(tmp)

    val refs = Seq(
      DerivedRef("primary_documents", s"$tmp/documents", "doc_id", Seq("source")),
      DerivedRef("sparse_postings", s"$tmp/sparse_postings", "doc_id"),
      DerivedRef("bm25_postings", s"$tmp/bm25_index/postings", "doc_id"),
      DerivedRef("bm25_doclen", s"$tmp/bm25_index/doclen", "doc_id"),
      DerivedRef("phrase_index", s"$tmp/phrase_index", "doc_id"),
      DerivedRef("codes", s"$tmp/codes", "vec_id", Seq("cell")))
    val report = Forget.forgetWithDerived(spark, refs, subjects)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // report reconciles: removed matches the planted counts everywhere
    removedExpected.foreach { case (a, exp) =>
      assert(report(a)._1 == exp, s"$a removed ${report(a)._1} != $exp")
    }
    // zero subject ROWS and zero subject CONTENT left anywhere
    def noSubject(path: String, key: String, valueCol: Option[String]): Unit = {
      val df = spark.read.option("basePath", path).parquet(path)
      assert(df.filter(col(key).isin(16L, 17L)).count() == 0, s"$path rows")
      valueCol.foreach { c =>
        assert(df.filter(col(c).contains("zzsentinel16zz") ||
          col(c).contains("zzsentinel17zz")).count() == 0, s"$path content")
      }
    }
    noSubject(s"$tmp/documents", "doc_id", Some("text"))
    noSubject(s"$tmp/sparse_postings", "doc_id", Some("sh"))
    noSubject(s"$tmp/bm25_index/postings", "doc_id", Some("term"))
    noSubject(s"$tmp/bm25_index/doclen", "doc_id", None)
    noSubject(s"$tmp/phrase_index", "doc_id", Some("word"))
    noSubject(s"$tmp/codes", "vec_id", None)
    // non-subject sentinels survive (the sweep is surgical, not a wipe)
    assert(spark.read.parquet(s"$tmp/sparse_postings")
      .filter(col("sh").contains("zzsentinel6zz")).count() > 0)

    // settled units byte-identical: cells 2/3 and subject-free sparse
    // files keep their mtimes; units_rewritten == touched units
    val mtAfter = mtimes(tmp)
    for (cell <- Seq(2, 3); (f, t) <- mtBefore
         if f.contains(s"cell=$cell")) {
      assert(mtAfter.get(f).contains(t), s"settled cell file rewritten: $f")
    }
    untouchedSparseFiles.foreach { uri =>
      val p = Paths.get(java.net.URI.create(uri)).toString
      assert(mtAfter.get(p) == mtBefore.get(p), s"subject-free file rewritten: $p")
    }
    assert(report("codes")._3 == 2L, s"codes units ${report("codes")._3} != 2 (cells 0, 1)")
    // 16 % 3 == 1, 17 % 3 == 2: the subjects live in src1 and src2
    assert(report("primary_documents")._3 == 2L,
      s"primary units ${report("primary_documents")._3} != 2 (src1, src2)")

    // idempotent: a second sweep finds nothing anywhere
    val again = Forget.forgetWithDerived(spark, refs, subjects).collect()
    assert(again.forall(_.getLong(1) == 0L), again.mkString(";"))
    assert(again.forall(_.getLong(3) == 0L), again.mkString(";"))
  }

  test("registry sweep reports never-built artifacts as zero rather than skipping silently") {
    val refs = Forget.derivedRegistryFor("/tmp/graft-no-such-dataset")
    assert(refs.map(_.artifact).toSet == Set("sparse_postings",
      "bm25_postings", "bm25_doclen", "phrase_index", "rp_proj",
      "pq_codes", "ivf_clustered", "ivfpq_codes"))
    val rep = Forget.forgetWithDerived(spark, refs, Seq(1L).toDF("id"))
      .collect()
    assert(rep.length == refs.length)
    assert(rep.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L
      && r.getLong(3) == 0L))
  }
}
