package graft

import org.apache.spark.sql.functions._

import graft.operators.Growth

/** User-growth accounting and rank-normalization semantics. */
class GrowthSpec extends SparkSpecBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("user growth: new vs returning vs cumulative on a planted stream") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"), // returning
      (4L, ts("2024-01-02 11:00:00"), 3L, "view", 1.0, "{}"), // new
      (5L, ts("2024-01-04 10:00:00"), 1L, "view", 1.0, "{}")) // returning only
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Growth.userGrowth(events).orderBy(col("day")).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 2L)))
    assert(out("2024-01-02") == ((1L, 2L, 3L)))
    assert(out("2024-01-04") == ((0L, 1L, 3L)))
  }

  test("user growth reconciles on the fixture") {
    val events = Tables.events(spark, sf)
    val out = Growth.userGrowth(events).orderBy(col("day")).collect()
    // final cumulative equals the exact distinct user count
    assert(out.last.getLong(3) ==
      events.select(col("user_id")).distinct().count())
    // cumulative is non-decreasing and sums the news
    val news = out.map(_.getLong(1))
    val tot = out.map(_.getLong(3))
    assert(tot.toSeq == news.scanLeft(0L)(_ + _).tail.toSeq)
    // active ≥ new every day
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("dataset card fields reconcile against direct computations") {
    import graft.operators.DatasetCard
    val docs = Tables.documents(spark, sf)
    val r = DatasetCard.datasetCard(docs).collect().head
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("n_langs") ==
      docs.select(col("lang")).distinct().count())
    assert(r.getAs[Long]("avg_words") ==
      r.getAs[Long]("n_words") / r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("dup_rate_milli") <= 1000L)
    assert(r.getAs[Long]("len_ok_milli") <= 1000L)
  }

  test("dataset card counts planted exact duplicates") {
    import spark.implicits._
    import graft.operators.DatasetCard
    val docs = Seq(
      (1L, "same text here", "en", "a", 14L),
      (2L, "same text here", "en", "a", 14L),
      (3L, "unique text", "de", "b", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = DatasetCard.datasetCard(docs).collect().head
    assert(r.getAs[Long]("dup_docs") == 2L)
    assert(r.getAs[Long]("dup_rate_milli") == 666L)
    assert(r.getAs[Long]("n_langs") == 2L && r.getAs[Long]("n_sources") == 2L)
  }

  test("vocab growth: cumulative vocabulary equals exact distinct words") {
    import graft.operators.DatasetCard
    val docs = Tables.documents(spark, sf)
    val out = DatasetCard.vocabGrowth(docs).orderBy(col("bucket")).collect()
    assert(out.length == DatasetCard.GrowthBuckets)
    val vocab = docs.select(explode(
      graft.functions.TextFns.words(col("text"))).as("w"))
      .distinct().count()
    assert(out.last.getLong(3) == vocab)
    // growth is monotone and new_words sums to the vocabulary
    val news = out.map(_.getLong(2))
    assert(out.map(_.getLong(3)).toSeq == news.scanLeft(0L)(_ + _).tail.toSeq)
    // tokens per bucket reconcile with the corpus total
    assert(out.map(_.getLong(1)).sum ==
      docs.select(org.apache.spark.sql.functions.sum(
        graft.functions.TextFns.wordCount(col("text")))).collect().head.getLong(0))
  }

  test("referential audit flags planted orphans and passes the clean fixture") {
    import graft.operators.Integrity
    val clean = Integrity.qReferential(spark, sf).collect()
    assert(clean.length == 4)
    assert(clean.forall(_.getAs[Boolean]("ok")), clean.mkString("; "))
    // planted orphan: an order pointing at a missing customer
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
    val bad = orders.limit(1)
      .withColumn("o_custkey", lit(999999L))
      .unionByName(orders)
    val cust = Tables.customer(spark, sf)
    val total = bad.agg(count(lit(1))).collect().head.getLong(0)
    val orphans = bad.join(
      cust.select(col("c_custkey").as("o_custkey")).distinct(),
      Seq("o_custkey"), "left_anti").count()
    assert(orphans == 1L && total == orders.count() + 1)
  }

  test("streaks: gaps split islands, consecutive days extend them") {
    import spark.implicits._
    import graft.operators.Integrity
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-02 18:00:00"), 1L, "view", 1.0, "{}"), // same day
      (4L, ts("2024-01-05 10:00:00"), 1L, "view", 1.0, "{}"),
      (5L, ts("2024-01-06 10:00:00"), 1L, "view", 1.0, "{}"),
      (6L, ts("2024-01-07 10:00:00"), 1L, "view", 1.0, "{}"),
      (7L, ts("2024-03-01 10:00:00"), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Integrity.streaks(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((5L, 3L, 2L))) // days 1,2 + 5,6,7
    assert(out(2L) == ((1L, 1L, 1L)))
  }

  test("confusion matrix reconciles and the diagonal dominates") {
    import graft.operators.Classify
    val docs = Tables.documents(spark, sf)
    val model = Classify.modelFor(spark, sf)
    val out = Classify.confusionMatrix(docs, model).collect()
    // cells sum to the corpus
    assert(out.map(_.getAs[Long]("n")).sum == docs.count())
    // per-actual totals consistent across that actual's rows
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum ==
        rows.head.getAs[Long]("n_actual"))
    }
    // overall accuracy beats chance (uniform over the label set)
    val correct = out.filter(r => r.getString(0) == r.getString(1))
      .map(_.getAs[Long]("n")).sum
    val nLabels = out.map(_.getString(0)).distinct.length
    assert(correct.toDouble / docs.count() > 1.0 / nLabels,
      s"accuracy ${correct}/${docs.count()} vs chance 1/$nLabels")
  }

  test("rank normalization matches the single-sort window transform") {
    val events = Tables.events(spark, sf)
    val got = Growth.rankNormalize(events, nPartitions = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val n = events.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value"), col("event_id"))
    val want = events.select(col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("pct_milli", floor(col("rnk") * lit(1000L) / lit(n)).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // bounds: max rank has pct 1000, pct in (0, 1000]
    assert(got.values.map(_._2).max == 1000L)
    assert(got.values.forall { case (_, p) => p >= 0L && p <= 1000L })
  }
}
