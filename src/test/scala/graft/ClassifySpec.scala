package graft

import org.apache.spark.sql.functions._

import graft.operators.Classify

/** Trained Naive Bayes classifier: accuracy on separable planted data,
  * integer-exact determinism, tie-break, vocab-cap, and unknown-gram
  * semantics. The fixture-corpus gate itself is the DuckDB oracle
  * (`classify_lang_nb`, generated from the trained model). */
class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private def planted(n: Int) = {
    // three classes with disjoint vocabularies — NB must be perfect here
    val vocab = Map(
      "aa" -> Seq("alpha", "apex", "arrow", "atlas"),
      "bb" -> Seq("bravo", "basin", "birch", "bolt"),
      "cc" -> Seq("cedar", "comet", "coral", "crane"))
    (0 until n).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val ws = vocab(lang)
      val text = (0 until 8).map(j => ws((i + j) % ws.size)).mkString(" ")
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
  }

  test("disjoint-vocab classes classify perfectly, train and held-out") {
    val docs = planted(90)
    val model = Classify.trainNaiveBayes(docs.filter($"doc_id" < 60))
    assert(model.labels == IndexedSeq("aa", "bb", "cc"))
    val preds = Classify.predict(docs, model)
      .join(docs, "doc_id")
      .select($"doc_id", $"pred_lang", $"lang", $"margin").collect()
    assert(preds.length == 90)
    preds.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"doc ${r.getLong(0)} misclassified")
      assert(r.getLong(3) > 0, s"doc ${r.getLong(0)}: separable data must have margin")
    }
  }

  test("prediction is integer-deterministic and ties break to the smallest label") {
    // two labels with IDENTICAL training text: every doc scores equal →
    // the lexicographic tie-break must pick "aa" with margin 0
    val train = Seq((1L, "x y z", "bb"), (2L, "x y z", "aa")).toDF("doc_id", "text", "lang")
    val model = Classify.trainNaiveBayes(train)
    val out = Classify.predict(Seq((10L, "x y")).toDF("doc_id", "text"), model).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "aa" && out(0).getLong(3) == 0L)
    // repeated runs produce identical rows (pure integer arithmetic)
    val docs = planted(30)
    val m2 = Classify.trainNaiveBayes(docs)
    val a = Classify.predict(docs, m2).orderBy("doc_id").collect().toSeq
    val b = Classify.predict(docs, m2).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("unknown grams fall back to the per-label default (priors decide)") {
    val train = Seq((1L, "alpha alpha", "aa"), (2L, "bravo", "bb"),
      (3L, "alpha apex", "aa")).toDF("doc_id", "text", "lang")
    val model = Classify.trainNaiveBayes(train)
    // a doc of entirely unseen words: score_l = prior_l + n·default_l.
    // bb trained on FEWER tokens, so its unknown-gram default
    // ln(1/(tokens+V)) is larger and outweighs aa's 2/3 prior:
    // aa = ln(2/3)+2·ln(1/7), bb = ln(1/3)+2·ln(1/4) → bb wins
    val out = Classify.predict(Seq((9L, "zzz qqq")).toDF("doc_id", "text"), model)
      .collect()
    assert(out(0).getString(1) == "bb")
    val expected = model.priors(1) +
      2 * model.defaults(1) // two unknown tokens
    assert(out(0).getLong(2) == expected, "score must be the exact integer sum")
  }

  test("vocab cap keeps the top-frequency grams with deterministic ties") {
    val train = Seq(
      (1L, "hot hot hot warm warm cold", "aa"),
      (2L, "hot warm cold cool cool", "bb")).toDF("doc_id", "text", "lang")
    val capped = Classify.trainNaiveBayes(train, maxVocab = 2)
    // totals: hot=4, warm=3, cold=2, cool=2 → top-2 = {hot, warm}
    assert(capped.gramLogp.keySet == Set("hot", "warm"))
    assert(capped.vocabSize == 2)
    // cap at 3: cold vs cool tie on count 2 → lexicographic keeps "cold"
    val cap3 = Classify.trainNaiveBayes(train, maxVocab = 3)
    assert(cap3.gramLogp.keySet == Set("hot", "warm", "cold"))
  }

  test("map-only expression prediction equals the relational path, batch and streaming") {
    val docs = planted(60)
    val model = Classify.trainNaiveBayes(docs)
    val relational = Classify.predict(docs, model)
      .orderBy("doc_id").collect().toSeq
    val mapOnly = docs.select((col("doc_id") +: Classify.predictCols(model)): _*)
      .orderBy("doc_id").collect().toSeq
    assert(relational == mapOnly,
      "expression form must produce identical (pred, score, margin) rows")
    // expression form has no exchange before the presentation sort
    val plan = docs.select(Classify.predictCols(model): _*)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-only path must not shuffle:\n$plan")

    // stateless → streams: admit only class "aa" from a landing dir
    val d = java.nio.file.Files.createTempDirectory("graft-classify").toString
    docs.write.mode("overwrite").parquet(d)
    val streamed = Classify.classifyAdmit(
      spark.readStream.schema(docs.schema).parquet(d), model, Set("aa"))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("classify_admit_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("classify_admit_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = Classify.classifyAdmit(docs, model, Set("aa"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty,
      s"streaming admission ${got.size} docs != batch ${want.size}")
  }

  test("corpus query trains on the split, predicts every doc, and the generated oracle carries the model") {
    val out = Classify.qClassifyLang(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs, "every doc gets a prediction")
    val model = Classify.cachedModel.get
    val sql = Classify.oClassifyLang(model)
    // every label and a sample gram literal must be inlined
    model.labels.foreach(l => assert(sql.contains(s"'$l'")))
    assert(sql.contains(model.priors.head.toString))
  }

  test("cohen's kappa: exact rational matches a hand-computed confusion") {
    // fixture kappa agrees with a driver-side recomputation from the
    // confusion matrix — exact integers end to end
    val conf = Classify.qClassifyConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = conf.values.sum
    val d = conf.collect { case ((a, p), c) if a == p => c }.sum
    val rows = conf.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val cols = conf.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    val e = rows.map { case (l, r) => r * cols.getOrElse(l, 0L) }.sum
    val out = Classify.qClassifyKappa(spark, sf).collect().head
    assert(out.getAs[Long]("n_total") == n)
    assert(out.getAs[Long]("n_agree") == d)
    assert(out.getAs[Long]("e_num") == e)
    assert(out.getAs[Long]("kappa_milli") ==
      math.floor(1000.0 * (n * d - e) / (n * n - e)).toLong)
    // the classifier must beat chance on the fixture (κ > 0; the tiny
    // sf0.001 split trains on ~40 docs, so demand direction, not size)
    assert(out.getAs[Long]("kappa_milli") > 0,
      s"classifier does not beat chance: ${out.getAs[Long]("kappa_milli")}")
  }

  test("kappa: single-class corpus is undefined → NULL, and negative kappa floors exactly") {
    // single class: E = N² → kappa_den = 0, κ undefined; the guard must
    // emit NULL symmetrically with the twin's CASE (ADVICE r15: DuckDB
    // CAST(NaN AS BIGINT) would raise where Spark floors NaN to NULL)
    val one = planted(30).filter($"lang" === "aa")
    val mono = Classify.trainNaiveBayes(one)
    val r = Classify.cohensKappa(one, mono).collect().head
    assert(r.getAs[Long]("kappa_den") == 0L)
    assert(r.isNullAt(r.fieldIndex("kappa_milli")),
      s"single-class kappa must be NULL: $r")
    // systematically swapped labels score WORSE than chance (κ < 0);
    // the exact-integer milli must equal the true rational floor (the
    // explicit non-negative division, where Spark div ≡ DuckDB //)
    val docs = planted(60).filter($"lang" =!= "cc")
    val swapped = docs.withColumn("lang",
      when($"lang" === "aa", "bb").otherwise("aa"))
    val bad = Classify.trainNaiveBayes(swapped)
    val out = Classify.cohensKappa(docs, bad).collect().head
    val (num, den) = (out.getAs[Long]("kappa_num"), out.getAs[Long]("kappa_den"))
    assert(num < 0L, s"swapped labels must be anti-correlated: $out")
    assert(out.getAs[Long]("kappa_milli") ==
      math.floor(1000.0 * num / den).toLong, s"negative floor drift: $out")
  }

  test("calibration bins: equal-depth partition, driver-recomputed accuracy") {
    val docs = Tables.documents(spark, sf)
    val model = Classify.modelFor(spark, sf)
    val out = Classify.qClassifyCalibration(spark, sf).collect()
    val n = docs.count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == n, "bins must partition")
    assert(out.forall(r => r.getAs[Long]("bin") >= 0 &&
      r.getAs[Long]("bin") <= 9))
    // equal depth up to rounding: bin sizes differ by at most 1
    val sizes = out.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
    // driver-side recomputation from the raw predictions
    val lang = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val preds = Classify.predict(docs, model).collect()
      .map(r => (r.getLong(3), r.getLong(0),
        if (r.getString(1) == lang(r.getLong(0))) 1L else 0L))
      .sortBy(p => (p._1, p._2))
    val expect = preds.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
      .map { case (b, g) => b -> (g.length.toLong, g.map(_._1._3).sum) }
    out.foreach { r =>
      val (en, ec) = expect(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_docs") == en && r.getAs[Long]("n_correct") == ec,
        s"bin ${r.getAs[Long]("bin")} diverged from driver recomputation")
    }
  }
}
