package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, ModelAudit, TextAnalysis, Tokenize}

/** VERDICT r14 item 3: a tripped retrain flag must lead to a model
  * retrained on the post-erasure corpus whose re-audit shows zero
  * erased mass — and un-flagged families must NOT be retrained. */
class RetrainSpec extends SparkSpecBase {
  import spark.implicits._

  private def synthetic(subjShare: Int, total: Int = 40) = {
    // subjShare docs from the subject source s0, the rest from s1..s3;
    // en/fr texts so the NB family has two classes
    (0 until total).map { i =>
      val src = if (i < subjShare) "s0" else s"s${1 + i % 3}"
      val lang = if (i % 2 == 0) "en" else "fr"
      val text = if (i % 2 == 0) s"the quick brown fox $i jumps the end"
      else s"le renard brun $i saute vite le fin"
      (i.toLong, text, lang, src)
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("dominant subject trips all text families; retrain yields zero-residue audit") {
    val docs = synthetic(subjShare = 20)
    val pre = ModelAudit.textModelAudit(docs, "s0")
    assert(pre.filter(col("retrain")).count() > 0, "subject at 50% must trip")
    val r = ModelAudit.retrainFlagged(docs, "s0", dsirTarget = "s1")
    assert(r.nb.isDefined && r.bpe.isDefined && r.dsirWeights.isDefined,
      "all three text families must retrain at 50% subject share")
    // the compliance statement: the retrained training partitions carry
    // ZERO erased mass
    val s = r.summary.collect()
    assert(s.nonEmpty)
    s.foreach { row =>
      assert(row.getAs[Long]("rows_erased") == 0L, row.toString)
      assert(row.getAs[Long]("erased_permille") == 0L, row.toString)
      assert(row.getAs[Boolean]("retrained"), row.toString)
    }
    // non-vacuous unlearning evidence: the retrained NB model was fitted
    // on different data than the pre-erasure model (priors shift when
    // half the corpus leaves)
    val preModel = Classify.trainNaiveBayes(
      TextAnalysis.withSplit(docs).filter(col("split") === "train"))
    val postModel = r.nb.get
    assert(preModel.priors != postModel.priors ||
      preModel.labels != postModel.labels,
      "retrained NB identical to pre-erasure model — retrain saw no new data")
    // and the retrained BPE merge table equals one trained fresh on the
    // clean corpus (determinism ties the artifact to its input)
    val fresh = Tokenize.trainBpe(
      TextAnalysis.withSplit(docs.filter(col("source") =!= "s0"))
        .filter(col("split") === "train"))
    assert(r.bpe.get.merges.map(_.toSeq).toSeq ==
      fresh.merges.map(_.toSeq).toSeq,
      "retrained BPE diverges from a fresh train on the clean corpus")
    // the retrained DSIR weights target the DESIGNATED surviving
    // exemplar: positive mass in target buckets (not the degenerate
    // target-free weights the review caught)
    val w = r.dsirWeights.get.collect()
    assert(w.nonEmpty && w.exists(_.getAs[Long]("wgt") >
      w.map(_.getAs[Long]("wgt")).min),
      "retrained DSIR weights are flat — no target signal")
  }

  test("retraining DSIR with the erased subject as exemplar is refused") {
    val docs = synthetic(subjShare = 20)
    val ex = intercept[IllegalArgumentException] {
      ModelAudit.retrainFlagged(docs, "s0", dsirTarget = "s0")
    }
    assert(ex.getMessage.contains("erased subject"))
  }

  test("no tripped flag, no retrain — artifacts stay in place") {
    val docs = synthetic(subjShare = 20)
    // a subject source that matches nothing: zero erased mass anywhere
    val r = ModelAudit.retrainFlagged(docs, "no_such_source")
    assert(r.nb.isEmpty && r.bpe.isEmpty && r.dsirWeights.isEmpty,
      "untripped families must not retrain")
    r.summary.collect().foreach { row =>
      assert(!row.getAs[Boolean]("was_flagged") &&
        !row.getAs[Boolean]("retrained"), row.toString)
    }
  }

  test("quantizer sweep: tripped IVF/PQ retrain to a zero-residue layout ≡ fresh train") {
    import graft.operators.{Ivf, Pq}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.centroidsFor(sf, emb)
    val books = Pq.codebooksFor(spark, sf)
    // expected flags from the audit operator itself (src0 is a ~1/6
    // corpus slice, so cells sit near 166‰ against the 100‰ threshold)
    val expected = ModelAudit.modelAudit(docs, emb, cents, books)
      .filter(col("model").isin("ivf", "pq") && col("retrain"))
      .select("model").distinct().collect().map(_.getString(0)).toSet
    val r = ModelAudit.retrainQuantizers(docs, emb, cents, books)
    assert(r.retrainedFamilies == expected,
      s"retrained ${r.retrainedFamilies} != audit-flagged $expected")
    assert(r.retrainedFamilies == Set("ivf", "pq"),
      s"fixture subject share must trip both families: ${r.retrainedFamilies}")
    // compliance statement: no cell of the post-sweep layout carries
    // erased training mass
    val s = r.summary.collect()
    assert(s.nonEmpty)
    s.foreach { row =>
      assert(row.getAs[Long]("rows_erased") == 0L, row.toString)
      assert(row.getAs[Long]("erased_permille") == 0L, row.toString)
      assert(row.getAs[Boolean]("retrained"), row.toString)
    }
    // determinism ties the retrained artifact to its input: byte-equal
    // to a fresh train on the post-erasure corpus (the operator's own
    // postEmbS construction, replicated)
    val docsS = docs.withColumn("_subj", col("source") === "src0")
    val postEmbS = emb.join(
      docsS.filter(!col("_subj"))
        .select(col("doc_id").as("vec_id"), col("_subj")), Seq("vec_id"))
    assert(r.centroids.map(_.toSeq) ==
      Ivf.trainCentroids(postEmbS).map(_.toSeq),
      "retrained centroids diverge from a fresh train on the clean corpus")
    assert(r.codebooks.map(_.map(_.toSeq)) ==
      Pq.trainCodebooks(postEmbS, 64).map(_.map(_.toSeq)),
      "retrained codebooks diverge from a fresh train on the clean corpus")
    // non-vacuous: the retrain saw different data than the originals
    assert(r.centroids.map(_.toSeq) != cents.map(_.toSeq),
      "retrained centroids identical to pre-erasure quantizer")
  }

  test("quantizer sweep: untripped subject keeps the serving quantizers") {
    import graft.operators.{Ivf, Pq}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.centroidsFor(sf, emb)
    val books = Pq.codebooksFor(spark, sf)
    val r = ModelAudit.retrainQuantizers(docs, emb, cents, books,
      subjectSource = "no_such_source")
    assert(r.retrainedFamilies.isEmpty, "nothing erased, nothing retrains")
    assert(r.centroids.map(_.toSeq) == cents.map(_.toSeq))
    assert(r.codebooks.map(_.map(_.toSeq)) == books.map(_.map(_.toSeq)))
    r.summary.collect().foreach { row =>
      assert(!row.getAs[Boolean]("retrained"), row.toString)
    }
  }

  test("fixture: only flagged families retrain; summary matches the gate shape") {
    val docs = Tables.documents(spark, sf)
    val pre = ModelAudit.textModelAudit(docs)
    val flaggedFams = pre.filter(col("retrain"))
      .select("model").distinct().collect().map(_.getString(0)).toSet
    val r = ModelAudit.retrainFlagged(docs)
    assert(r.nb.isDefined == flaggedFams("nb_lang"))
    assert(r.bpe.isDefined == flaggedFams("bpe"))
    assert(r.dsirWeights.isDefined == flaggedFams("dsir"))
    val bad = r.summary
      .filter(col("rows_erased") =!= 0L || col("erased_permille") =!= 0L)
      .count()
    assert(bad == 0L, "post-erasure audit must be residue-free")
  }
}
