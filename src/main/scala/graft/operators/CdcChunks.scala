package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Content-defined chunking (LBFS/rsync-style): chunk boundaries fall
  * AFTER any word whose trailing 4-gram hashes to 0 mod [[Divisor]] —
  * the boundary depends only on local CONTENT, so inserting or deleting
  * a word re-chunks the corpus only until the next boundary, and every
  * later chunk still byte-matches its twin in the unedited copy.
  * Fixed-width segmentation ([[Passages]], 16-word blocks) loses ALL
  * alignment after one inserted word; stride-1 windows ([[Spans]]) are
  * alignment-free but cost a window per word. CDC is the middle point:
  * ~1 chunk per [[Divisor]] words, shift-robust by construction — the
  * storage-dedup trick applied to corpus near-dedup.
  *
  * Scale shape (100 TB): boundary flags and chunk ids are computed in
  * ONE (doc, position) window pass (map-side after the explode, one
  * doc-keyed shuffle), chunk assembly is a second window over the same
  * partitioning (reused exchange), and the cross-corpus first-occurrence
  * pass is one shuffle keyed on the chunk text (digest at real scale —
  * the [[Passages]] note). Linear; no pair joins.
  */
object CdcChunks {

  /** Average chunk length in words (boundary probability 1/Divisor). */
  val Divisor = 16
  /** Trailing n-gram width feeding the boundary hash. */
  val GramWords = 4

  /** (doc_id, chunk_id, n_words, chunk_text, is_first) — chunks with
    * corpus-wide first-occurrence marking. */
  def cdcChunks(docs: DataFrame): DataFrame = {
    val ws = TextFns.words(col("text"))
    val tok = docs.select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(col("ws")).as(Seq("wpos", "word")))
    val flag = when(col("wpos") >= GramWords - 1 &&
      TextFns.md5u56(array_join(
        slice(col("ws"), col("wpos") - (GramWords - 2), lit(GramWords)), " "))
        % Divisor === 0, 1).otherwise(0)
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("wpos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = tok
      .withColumn("b", flag)
      .withColumn("chunk_id",
        coalesce(sum(col("b")).over(wPrev), lit(0L)).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_words"),
        array_join(transform(
          array_sort(collect_list(struct(col("wpos"), col("word")))),
          s => s.getField("word")), " ").as("chunk_text"))
    val firstOcc = Window.partitionBy(col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
    chunks.withColumn("is_first", row_number().over(firstOcc) === 1)
  }

  def qCdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunks(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_id"))

  def oCdcChunks: String = {
    val h = TextFns.md5u56Sql(
      s"array_to_string(ws[i-${GramWords - 2} : i+1], ' ')")
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, ws, CAST(i AS INTEGER) AS wpos, ws[i+1] AS word,
      |         CASE WHEN i >= ${GramWords - 1} AND $h % $Divisor = 0
      |              THEN 1 ELSE 0 END AS b
      |  FROM w, unnest(range(0, len(ws))) AS t(i)),
      |cid AS (
      |  SELECT doc_id, wpos, word,
      |         CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY wpos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS chunk_id
      |  FROM tok),
      |ch AS (
      |  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_words,
      |         string_agg(word, ' ' ORDER BY wpos) AS chunk_text
      |  FROM cid GROUP BY doc_id, chunk_id)
      |SELECT doc_id, chunk_id, n_words, chunk_text,
      |       row_number() OVER (PARTITION BY chunk_text
      |                          ORDER BY doc_id, chunk_id) = 1 AS is_first
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---------------------------------------------------- class weights

  /** Inverse-frequency class weights for training-loss balancing:
    * weight(c) = N / (K · n_c), emitted as the exact integer surrogate
    * ⌊N·1000 / (K·n_c)⌋ — a ≤K-row control-plane table the trainer
    * broadcasts. One partial-agg shuffle over the label column. */
  def classWeights(docs: DataFrame, labelCol: String): DataFrame = {
    val counts = docs.groupBy(col(labelCol)).agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("n_classes"))
    counts.crossJoin(broadcast(totals))
      .withColumn("weight_milli",
        floor(col("n_total") * lit(1000L) / (col("n_classes") * col("n_docs")))
          .cast("long"))
      .select(col(labelCol), col("n_docs"), col("weight_milli"))
  }

  def qClassWeights(spark: SparkSession, dir: String): DataFrame =
    classWeights(Tables.documents(spark, dir), "lang").orderBy(col("lang"))

  def oClassWeights: String =
    """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
      |             count(*) AS n_classes FROM c)
      |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
      |       CAST(floor(n_total * 1000 / (n_classes * n_docs)) AS BIGINT)
      |         AS weight_milli
      |FROM c, t ORDER BY lang""".stripMargin
}
