package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Exact repeated-substring span removal — the suffix-array dedup
  * granularity (find every duplicated run of ≥ K consecutive words
  * anywhere in the corpus and remove all but its first occurrence),
  * re-expressed Spark-first: instead of a monolithic suffix array, every
  * stride-1 window of [[SpanWords]] words becomes a key, the corpus-wide
  * first occurrence of each window survives, and the union of all
  * non-first windows marks the word positions to drop. A duplicated run
  * of length L ≥ K is covered by its L−K+1 duplicated windows, so the
  * removed spans are exactly the maximal repeated substrings of length
  * ≥ K — the same spans a suffix-array pass would emit — without any
  * global ordered structure.
  *
  * Contrast with [[Passages]] (fixed non-overlapping 16-word segments):
  * stride-1 windows catch repeats at ANY alignment, the case passage
  * dedup misses when boilerplate shifts by a word.
  *
  * Scale shape (100 TB): one explode (~1 window/word, map-only), one
  * shuffle keyed on the window text for the first-occurrence window
  * function, one ×K explode of the (rare) duplicated windows, one
  * distinct + one doc-position join, one shuffle back on doc_id for
  * reassembly. No pair joins, no candidate blow-up — linear in corpus
  * word count. On a real deployment the window key would be a fixed-width
  * digest (md5) instead of the raw K words on the wire; here the raw
  * window keys the shuffle so the DuckDB oracle groups on exactly the
  * same value.
  */
object Spans {

  /** Minimum duplicated-run length in words. 8 ≈ a clause — long enough
    * that natural re-use is rare, short enough to catch template text. */
  val SpanWords = 8

  /** (doc_id, ws) with the words array materialized as an attribute —
    * the projection boundary that keeps downstream lambdas from
    * re-splitting the text per element ([[TextFns.shinglesFromWords]]). */
  private def withWords(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.words(col("text")).as("ws"))

  /** Stride-1 windows: (doc_id, pos, gram) for pos ∈ [0, n−K]; docs
    * shorter than K words emit none (nothing short can be a K-repeat). */
  def windows(docs: DataFrame, k: Int = SpanWords): DataFrame = {
    val nW = greatest(size(col("ws")) - k + 1, lit(0))
    withWords(docs)
      .select(col("doc_id"), col("ws"),
        explode(when(nW > 0, sequence(lit(0), nW - 1))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("ws"), col("pos") + 1, lit(k)), " ").as("gram"))
  }

  /** Per-document span-dedup result: word count, words removed (covered
    * by some non-first duplicated window), and the text rebuilt from the
    * surviving positions in order.
    *
    * `digestKeys = true` keys the first-occurrence shuffle on
    * `md5(gram)` instead of the raw K words — the fixed-width wire
    * format a 100 TB run uses (the scaladoc's promise, made runnable):
    * 32 bytes per window on the shuffle regardless of K. Results are
    * identical unless md5 collides (2⁻⁶⁴-scale; spec-pinned equal on
    * the fixture); the oracle keys on the raw gram, so the gated query
    * uses the default. */
  def substringSpanDedup(docs: DataFrame, k: Int = SpanWords,
      digestKeys: Boolean = false): DataFrame = {
    val key = if (digestKeys) md5(col("gram")) else col("gram")
    val firstOcc = Window.partitionBy(key)
      .orderBy(col("doc_id"), col("pos"))
    val covered = windows(docs, k)
      .withColumn("rn", row_number().over(firstOcc))
      .filter(col("rn") > 1)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + k - 1)).as("wpos"))
      .distinct()
      .withColumn("cov", lit(1))
    val words = withWords(docs)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("wpos", "word")))
    words.join(covered, Seq("doc_id", "wpos"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("cov").isNotNull, 1L).otherwise(0L)).as("removed_words"),
        // collect_list drops the nulls of the unmatched `when`; the
        // struct sort restores document order collect_list doesn't keep
        array_join(
          transform(
            array_sort(collect_list(when(col("cov").isNull,
              struct(col("wpos"), col("word"))))),
            s => s.getField("word")),
          " ").as("cleaned_text"))
  }

  def qSubstringSpans(spark: SparkSession, dir: String): DataFrame =
    substringSpanDedup(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  def oSubstringSpans: String =
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
      |         array_to_string(ws[i+1 : i+$SpanWords], ' ') AS gram
      |  FROM w, unnest(range(0, greatest(len(ws) - ${SpanWords - 1}, 0))) AS t(i)),
      |r AS (
      |  SELECT doc_id, pos,
      |         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
      |  FROM g),
      |cov AS (
      |  SELECT DISTINCT doc_id, CAST(p AS INTEGER) AS wpos
      |  FROM r, unnest(range(pos, pos + $SpanWords)) AS t(p)
      |  WHERE rn > 1),
      |wp AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS wpos, ws[i+1] AS word
      |  FROM w, unnest(range(0, len(ws))) AS t(i))
      |SELECT wp.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(CASE WHEN cov.wpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS removed_words,
      |       coalesce(string_agg(CASE WHEN cov.wpos IS NULL THEN wp.word END, ' '
      |                           ORDER BY wp.wpos), '') AS cleaned_text
      |FROM wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.wpos = cov.wpos
      |GROUP BY wp.doc_id ORDER BY wp.doc_id""".stripMargin
}
