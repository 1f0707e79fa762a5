package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Passage-level (sub-document) deduplication — the RefinedWeb/CCNet
  * granularity between exact-doc dedup and near-dup pair removal:
  * boilerplate repeated ACROSS documents (headers, license blocks,
  * navigation text) is removed from every copy but the first, while the
  * unique remainder of each document survives.
  *
  * The fixture corpus has no paragraph markers, so passages are fixed
  * windows of [[SegWords]] consecutive words — the standard fallback
  * segmentation when boundaries aren't annotated. A passage is kept at
  * its FIRST corpus occurrence (ordered by doc_id, then position) and
  * dropped everywhere else; documents are reassembled from their kept
  * passages in order.
  *
  * Scale shape (100 TB): one explode (map-only, fused into the scan), one
  * shuffle keyed on the passage for the first-occurrence window, one
  * shuffle back on doc_id for reassembly. No joins, no candidate pairs —
  * linear in corpus size. On a real deployment the window key would be
  * `md5(seg)` (fixed-width digest instead of full text on the wire); here
  * the raw passage keys the window so the DuckDB oracle groups on exactly
  * the same value.
  */
object Passages {

  /** Passage width in words. 16 ≈ two sentences of running text. */
  val SegWords = 16

  /** (doc_id, pos, seg): consecutive [[SegWords]]-word windows per doc.
    * Map-only — sequence+transform build the slices without a shuffle. */
  def segments(docs: DataFrame): DataFrame = {
    val ws = TextFns.words(col("text"))
    val nSeg = ceil(size(ws) / lit(SegWords.toDouble)).cast("int")
    docs
      .select(col("doc_id"), ws.as("ws"), nSeg.as("n_seg"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), col("n_seg") - 1),
          i => array_join(slice(col("ws"), i * SegWords + 1, lit(SegWords)), " ")))
        .as(Seq("pos", "seg")))
  }

  /** Per-document result of corpus-wide passage dedup: total passages,
    * passages kept (first corpus occurrence), and the cleaned text
    * rebuilt from kept passages in document order. */
  def passageDedup(docs: DataFrame): DataFrame = {
    val firstOcc = Window.partitionBy(col("seg"))
      .orderBy(col("doc_id"), col("pos"))
    segments(docs)
      .withColumn("rn", row_number().over(firstOcc))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_segs"),
        // collect_list drops the nulls from the unmatched `when`; the
        // array_sort on (pos, seg) structs restores document order that
        // collect_list itself doesn't guarantee
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") === 1,
              struct(col("pos"), col("seg"))))),
            s => s.getField("seg")),
          " ").as("cleaned_text"))
  }

  def qPassageDedup(spark: SparkSession, dir: String): DataFrame =
    passageDedup(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  def oPassageDedup: String =
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |segs AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
      |         array_to_string(ws[i*$SegWords+1 : i*$SegWords+$SegWords], ' ') AS seg
      |  FROM w, unnest(range(0, CAST(ceil(len(ws)/$SegWords.0) AS BIGINT))) AS t(i)),
      |r AS (
      |  SELECT doc_id, pos, seg,
      |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
      |  FROM segs)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
      |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
      |       coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), '')
      |         AS cleaned_text
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
