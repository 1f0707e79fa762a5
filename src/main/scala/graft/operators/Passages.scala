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

  // ---------------------------------------------------------------- chunks

  /** Chunk width / stride in words for [[chunks]]. Stride < width gives
    * the overlap (width − stride words) that RAG and embedding pipelines
    * keep so no sentence is split across a hard boundary without context
    * on either side. */
  val ChunkWords = 64
  val ChunkStride = 48

  /** Sliding-window chunking with overlap — the chunk-for-embedding step
    * of a training/RAG pipeline (reference stores documents whole:
    * documents.parquet per TESTDATA.md; chunking is the first derived
    * granularity an embedding stage needs).
    *
    * Chunk `i` covers words `[i·stride, i·stride + width)`; the chunk
    * count `1 + ceil(max(n − width, 0) / stride)` ends exactly at the
    * first window that reaches the document tail. With stride < width
    * the tail chunk always carries ≥ width − stride + 1 words — there is
    * no runt-chunk drop rule to tune (a property of counting from
    * `n − width`, not `n`).
    *
    * Scale shape (100 TB): map-only — one scan, per-row sequence +
    * slice, one posexplode; no shuffle at all. The chunk-count and word
    * arrays are pinned behind projection boundaries so the transform
    * lambda doesn't re-split the text per chunk (the lambda-inlining
    * trap [[TextAnalysis]] documents). Downstream embedding/indexing
    * repartitions by whatever key it needs; chunking itself adds zero
    * exchanges. */
  def chunks(docs: DataFrame,
      width: Int = ChunkWords, stride: Int = ChunkStride): DataFrame = {
    require(stride > 0 && stride <= width, s"stride $stride vs width $width")
    val ws = TextFns.words(col("text"))
    docs
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n"), col("ws"),
        (lit(1) + ceil(greatest(size(col("ws")) - width, lit(0)) /
          lit(stride.toDouble)).cast("int")).as("n_chunks"))
      .select(col("doc_id"), col("n"), posexplode(
        transform(sequence(lit(0), col("n_chunks") - 1),
          i => array_join(slice(col("ws"), i * stride + 1, lit(width)), " ")))
        .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(width), col("n") - col("chunk_id") * stride)
          .cast("long").as("n_tokens"),
        col("chunk_text"))
  }

  def qChunks(spark: SparkSession, dir: String): DataFrame =
    chunks(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_id"))

  def oChunks: String =
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, len(ws) AS n, ws,
      |         1 + CAST(ceil(greatest(len(ws) - $ChunkWords, 0) / $ChunkStride.0)
      |               AS BIGINT) AS n_chunks
      |  FROM w)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
      |       CAST(least($ChunkWords, n - i*$ChunkStride) AS BIGINT) AS n_tokens,
      |       array_to_string(ws[i*$ChunkStride+1 : i*$ChunkStride+$ChunkWords], ' ')
      |         AS chunk_text
      |FROM c, unnest(range(0, n_chunks)) AS t(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

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
