package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Dataset-card statistics — the one-row summary block a corpus release
  * ships with, and the vocabulary-growth curve behind "is more data
  * still adding new tokens".
  */
object DatasetCard {

  /** One row: corpus size, token volume, language/source breadth,
    * exact-duplicate exposure, and quality-gate pass rate — every field
    * an exact integer or ⌊·1000⌋ ratio. Two partial-agg shuffles (the
    * corpus-wide fold and the fingerprint dup scan) + control-plane
    * combine; nothing scales past the fingerprint group table. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val ws = TextFns.words(col("text"))
    val enriched = docs.select(col("doc_id"), col("lang"), col("source"),
      size(ws).as("n_words"),
      TextFns.fingerprint(col("text")).as("fp"),
      (length(col("text")) >= TextFns.QualityMinChars &&
        length(col("text")) <= TextFns.QualityMaxChars).as("len_ok"))
    val dupDocs = enriched.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("dup_docs"))
    val base = enriched.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_words")).as("n_words"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(when(col("len_ok"), 1L).otherwise(0L)).as("len_ok_docs"))
    base.crossJoin(broadcast(dupDocs))
      .select(col("n_docs"), col("n_words"), col("n_langs"), col("n_sources"),
        floor(col("n_words") * lit(1L) / col("n_docs")).cast("long")
          .as("avg_words"),
        col("dup_docs"),
        floor(col("dup_docs") * lit(1000L) / col("n_docs")).cast("long")
          .as("dup_rate_milli"),
        floor(col("len_ok_docs") * lit(1000L) / col("n_docs")).cast("long")
          .as("len_ok_milli"))
  }

  def qDatasetCard(spark: SparkSession, dir: String): DataFrame =
    datasetCard(Tables.documents(spark, dir))

  def oDatasetCard: String =
    raw"""WITH e AS (
      |  SELECT doc_id, lang, source,
      |    len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_words,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |    length(text) BETWEEN ${TextFns.QualityMinChars}
      |      AND ${TextFns.QualityMaxChars} AS len_ok
      |  FROM documents),
      |d AS (
      |  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS dup_docs
      |  FROM (SELECT fp, count(*) AS c FROM e GROUP BY fp HAVING count(*) > 1)),
      |b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_words) AS BIGINT) AS n_words,
      |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |         CAST(sum(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT)
      |           AS len_ok_docs
      |  FROM e)
      |SELECT n_docs, n_words, n_langs, n_sources,
      |  CAST(floor(n_words / n_docs) AS BIGINT) AS avg_words,
      |  dup_docs,
      |  CAST(floor(dup_docs * 1000 / n_docs) AS BIGINT) AS dup_rate_milli,
      |  CAST(floor(len_ok_docs * 1000 / n_docs) AS BIGINT) AS len_ok_milli
      |FROM b, d""".stripMargin

  // ------------------------------------------------- vocabulary growth

  val GrowthBuckets = 10

  /** Heaps-law curve: split the corpus into [[GrowthBuckets]] doc_id
    * ranges and report, per bucket, token volume, words first seen
    * there, and cumulative vocabulary. Exact cumulative-distinct falls
    * out linearly because Σ(new words/bucket) IS the running distinct —
    * each word charges exactly its FIRST bucket (the [[Growth]]
    * user-growth identity applied to vocabulary). One explode + one
    * word-grain min-aggregate + a ≤buckets cumulative window. */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    val maxId = docs.agg(max(col("doc_id")).as("max_id"))
    val toks = docs.crossJoin(broadcast(maxId))
      .select(
        floor(col("doc_id") * GrowthBuckets / (col("max_id") + 1))
          .cast("int").as("bucket"),
        explode(TextFns.words(col("text"))).as("word"))
    val perBucket = toks.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val firstBucket = toks.groupBy(col("word"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_words"))
    val wRun = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(firstBucket, Seq("bucket"), "left")
      .withColumn("new_words", coalesce(col("new_words"), lit(0L)))
      .withColumn("vocab_size", sum(col("new_words")).over(wRun).cast("long"))
      .select(col("bucket"), col("n_tokens"), col("new_words"),
        col("vocab_size"))
  }

  def qVocabGrowth(spark: SparkSession, dir: String): DataFrame =
    vocabGrowth(Tables.documents(spark, dir)).orderBy(col("bucket"))

  def oVocabGrowth: String =
    raw"""WITH m AS (SELECT max(doc_id) AS max_id FROM documents),
      |t AS (
      |  SELECT CAST(floor(doc_id * $GrowthBuckets / (max_id + 1)) AS INTEGER)
      |           AS bucket,
      |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
      |  FROM documents, m),
      |pb AS (SELECT bucket, count(*) AS n_tokens FROM t GROUP BY bucket),
      |fb AS (
      |  SELECT bucket, count(*) AS new_words
      |  FROM (SELECT word, min(bucket) AS bucket FROM t GROUP BY word)
      |  GROUP BY bucket)
      |SELECT pb.bucket, CAST(pb.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(coalesce(fb.new_words, 0) AS BIGINT) AS new_words,
      |  CAST(sum(coalesce(fb.new_words, 0)) OVER (ORDER BY pb.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS vocab_size
      |FROM pb LEFT JOIN fb ON pb.bucket = fb.bucket
      |ORDER BY pb.bucket""".stripMargin
}
