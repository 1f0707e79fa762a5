package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
  * maximal stopword-free word runs; each word scores deg/freq over the
  * candidate set (deg = Σ length of phrases containing it, freq = its
  * instance count), and a phrase scores the sum of its member scores.
  * The corpus-level output is the top 25 distinct phrases.
  *
  * Determinism: deg and freq are exact longs, so each word score is one
  * deterministic double division; a phrase's score folds member scores
  * LEFT-TO-RIGHT in word order (Spark `aggregate` over the
  * position-sorted list ↔ DuckDB `list_reduce` over `list(… ORDER BY
  * wpos)`), and scores are strictly positive so the 0-init fold is
  * bit-identical to the init-free one. Ties in the top-25 cut break on
  * the phrase text — a total order, since phrases are distinct.
  *
  * Scale shape (100 TB): one explode, one (doc, position) window shuffle
  * for run assembly, one word-keyed partial-agg for stats (vocabulary-
  * sized, broadcast back), one (doc, run) shuffle for phrase re-assembly,
  * and a TakeOrdered(25) — no pair joins, linear in corpus word count.
  * The phrase-length cap (4) bounds every reassembled row. */
object Rake {

  val MaxPhraseLen = 4
  val TopK = 25

  def rakeKeywords(docs: DataFrame, maxLen: Int = MaxPhraseLen,
      topK: Int = TopK): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(TextFns.words(col("text"))).as(Seq("wpos", "word")))
    val ns = toks.filter(!col("word").isin(TextFns.EnStopwords: _*))
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("wpos"))
    val wPhrase = Window.partitionBy(col("doc_id"), col("rkey"))
    val members = ns
      .withColumn("rkey", col("wpos") - row_number().over(wRun))
      .withColumn("plen", count(lit(1)).over(wPhrase))
      .filter(col("plen") <= maxLen)
    val wordStats = members.groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = members.join(broadcast(wordStats), Seq("word"))
      .withColumn("wscore", col("deg").cast("double") / col("freq").cast("double"))
    val phrases = scored.groupBy(col("doc_id"), col("rkey"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("wpos"), col("word")))),
          s => s.getField("word")), " ").as("phrase"),
        aggregate(transform(
          array_sort(collect_list(struct(col("wpos"), col("wscore")))),
          s => s.getField("wscore")), lit(0.0), (acc, x) => acc + x).as("score"),
        count(lit(1)).as("n_words"))
    val uniq = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("score")).as("score"),
        max(col("n_words")).as("n_words"))
    val wTop = Window.orderBy(col("score").desc, col("phrase"))
    uniq.orderBy(col("score").desc, col("phrase")).limit(topK)
      .withColumn("rank", row_number().over(wTop))
      .select(col("rank"), col("phrase"), col("n_words"),
        col("n_occurrences"), col("score"))
  }

  def qRakeKeywords(spark: SparkSession, dir: String): DataFrame =
    rakeKeywords(Tables.documents(spark, dir)).orderBy(col("rank"))

  def oRakeKeywords: String = {
    val stops = TextFns.EnStopwords.map(s => s"'$s'").mkString(", ")
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS wpos, ws[i+1] AS word
      |  FROM w, unnest(range(0, len(ws))) AS t(i)),
      |ns AS (SELECT * FROM tok WHERE word NOT IN ($stops)),
      |runs AS (
      |  SELECT doc_id, wpos, word,
      |         wpos - row_number() OVER (PARTITION BY doc_id ORDER BY wpos) AS rkey
      |  FROM ns),
      |mem AS (
      |  SELECT *, count(*) OVER (PARTITION BY doc_id, rkey) AS plen FROM runs),
      |kept AS (SELECT * FROM mem WHERE plen <= $MaxPhraseLen),
      |ws2 AS (SELECT word, count(*) AS freq, sum(plen) AS deg
      |        FROM kept GROUP BY word),
      |sc AS (
      |  SELECT k.doc_id, k.rkey, k.wpos, k.word,
      |         CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS wscore
      |  FROM kept k JOIN ws2 USING (word)),
      |ph AS (
      |  SELECT doc_id, rkey,
      |         string_agg(word, ' ' ORDER BY wpos) AS phrase,
      |         list_reduce(list(wscore ORDER BY wpos), (a, b) -> a + b) AS score,
      |         count(*) AS plen
      |  FROM sc GROUP BY doc_id, rkey),
      |uq AS (
      |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
      |         max(score) AS score, CAST(max(plen) AS BIGINT) AS n_words
      |  FROM ph GROUP BY phrase)
      |SELECT CAST(row_number() OVER (ORDER BY score DESC, phrase) AS INTEGER) AS rank,
      |       phrase, n_words, n_occurrences, score
      |FROM uq ORDER BY score DESC, phrase LIMIT $TopK""".stripMargin
  }
}
