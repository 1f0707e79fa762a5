package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, ModelAudit, Pq, TextAnalysis}

/** Erasure-impact audit for trained artifacts (VERDICT r13 item 5):
  * a planted corpus where one source ("gone", the departed provider)
  * owns an entire language class must trip that class's retrain flag
  * at 1000 permille, a class it never touched must stay at 0, and the
  * flag must be EXACTLY thresholded (≥ trips, one permille above the
  * cell's share does not). */
class ModelAuditSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(i: Int): Array[Float] =
    Array.tabulate(64)(j => (((i * 31 + j * 7) % 17) - 8) / 8.0f)

  private lazy val docs = (
    (0 until 30).map(i => (i.toLong, "gone", "xx", s"alpha beta g$i")) ++
    (30 until 60).map(i => (i.toLong, "kept", "yy", s"gamma delta k$i")) ++
    (60 until 80).map(i =>
      (i.toLong, if (i % 2 == 0) "gone" else "kept", "zz", s"eps zeta m$i"))
  ).toDF("doc_id", "source", "lang", "text")

  private lazy val emb =
    (0 until 80).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private lazy val cents = Ivf.trainCentroids(emb, k = 4)
  private lazy val books = Pq.trainCodebooks(emb, 64)

  private def rowsAt(threshold: Long) =
    ModelAudit.modelAudit(docs, emb, cents, books, "gone", threshold)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap

  test("subject-owned class trips at 1000 permille; untouched class stays 0") {
    val out = rowsAt(500L)
    val (xe, xt, xp, xr) = out(("nb_lang", "xx"))
    assert(xe == xt && xp == 1000L && xr,
      s"fully subject-derived class must trip: $xe/$xt")
    val (ye, _, yp, yr) = out(("nb_lang", "yy"))
    assert(ye == 0L && yp == 0L && !yr)
    // share arithmetic + flag are exactly consistent on EVERY cell
    out.foreach { case ((m, c), (e, t, p, r)) =>
      assert(t > 0 && e <= t, s"$m/$c counts")
      assert(p == (1000L * e) / t, s"$m/$c permille drifted")
      assert(r == (p >= 500L), s"$m/$c flag inconsistent with threshold")
    }
    // per-family mass conservation: assignment partitions the corpus
    def total(model: String) =
      out.collect { case ((m, _), (_, t, _, _)) if m == model => t }.sum
    assert(total("ivf") == 80L, "every vector lands in exactly one cell")
    assert(total("pq") == 8L * 80L, "every subvector quantizes once")
  }

  test("retrain flag is >=-thresholded: the cell's own share trips, one above does not") {
    // mixed class: expected train-split composition derived from the
    // SAME deterministic split the training paths use
    val tr = TextAnalysis.withSplit(docs).filter(col("split") === "train")
      .filter(col("lang") === "zz")
      .agg(sum(when(col("source") === "gone", 1L).otherwise(0L)),
        count(lit(1))).head()
    val (gone, tot) = (tr.getLong(0), tr.getLong(1))
    assert(gone > 0 && gone < tot, "fixture vacuous — resize the zz class")
    val p = (1000L * gone) / tot
    assert(rowsAt(p)(("nb_lang", "zz"))._4, "share == threshold must trip")
    assert(!rowsAt(p + 1)(("nb_lang", "zz"))._4,
      "share < threshold must not trip")
  }

  test("serving swap: rebuilt-layout ivfpq reads equal the retrained-quantizer inline path") {
    // VERDICT r16 #3 — the opt-in swap, proven THROUGH the read path:
    // a sim_ivfpq_serving_topk-shaped query over the rebuilt layout
    // must equal the inline path under the RETRAINED quantizers, and
    // the read-path re-audit must carry zero erased mass everywhere
    val dir = sf
    val emb = Tables.embeddings(spark, dir)
    val dcs = Tables.documents(spark, dir)
    val stale = Ivf.centroidsFor(dir, emb)
    val r = ModelAudit.retrainQuantizers(dcs, emb, stale,
      Pq.codebooksFor(spark, dir))
    assert(r.retrainedFamilies.nonEmpty,
      "fixture vacuous — no quantizer family tripped, the swap tests nothing")
    if (r.retrainedFamilies("ivf"))
      assert(!r.centroids.zip(stale).forall { case (a, b) => a.sameElements(b) },
        "retrained coarse quantizer is byte-identical to the stale one")
    val post = emb.join(
      dcs.filter(col("source") =!= ModelAudit.SubjectSource)
        .select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val path = ModelAudit.rebuildServingLayout(spark, dir)
    val viaLayout = Pq.ivfPqTopKFromCodes(spark.read.parquet(path), post,
        r.centroids, r.codebooks, k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val inline = Pq.ivfPqTopKWith(post, r.centroids, r.codebooks,
        k = 5, nQueries = 50)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    assert(viaLayout.nonEmpty)
    assert(viaLayout.toSeq == inline.toSeq,
      "serving-layout reads diverge from the retrained inline path")
    val audit = ModelAudit.qForgetRetrainServing(spark, dir).collect()
    assert(audit.nonEmpty)
    assert(audit.forall(_.getLong(3) == 0L),
      "the rebuilt serving layout still carries erased mass")
  }
}
