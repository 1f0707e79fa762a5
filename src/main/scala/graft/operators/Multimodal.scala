package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media payloads as opaque binary columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual codec step is a STUB — no image/audio libraries exist in
  * this environment — but everything Spark-side is real: schema (binary +
  * metadata struct), batch shape (mapPartitions = the JVM analog of a
  * vectorized pandas-batch UDF), deterministic fake features so outputs
  * are testable, and partitioning that keeps one payload per row without
  * driver materialization. Swap `decodeStub` for a real codec and the
  * plumbing is unchanged.
  */
object Multimodal {

  case class Media(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, size_bytes: Int,
      features: Array[Double])

  /** Fixture adapter: treat document text bytes as the opaque payload
    * (the fixtures carry no real media; the pipeline doesn't care). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** One stub feature dim: a cross-engine md5-derived hash of
    * payload‖dim-index, scaled into [0,1) — deterministic AND
    * reproducible by the DuckDB oracle (TextFns.md5u56). */
  def stubFeature(payload: Column, i: Int): Column =
    pmod(graft.functions.TextFns.md5u56(
        concat(payload, lit(i.toString.getBytes("UTF-8")))), lit(100000L))
      .cast("double") / lit(100000.0)

  /** STUB decode: deterministic pseudo-features from payload hashes —
    * stands in for decode→resize→embed. Expression form (codegen'd). */
  def decodeStubExpr(payload: Column, dims: Int = 8): Column =
    array((0 until dims).map(i => stubFeature(payload, i)): _*)

  /** STUB decode, partition-batch form: the mapPartitions iterator is
    * where a real codec would amortize per-batch init (model load, native
    * buffers) — same role as mapInPandas batches in the Python API. */
  def decodeStub(m: Media, dims: Int = 8): MediaFeatures = {
    val feats = Array.tabulate(dims) { i =>
      // ??? real codec goes here; fake = byte-sum rolling hash per dim
      var h = 1125899906842597L + i
      var j = 0
      while (j < m.payload.length) { h = 31 * h + m.payload(j); j += 1 }
      math.abs(h % 100000L) / 100000.0
    }
    MediaFeatures(m.doc_id, m.mime, m.payload.length, feats)
  }

  def decodePartitions(media: Dataset[Media], dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // per-partition init happens once here (codec handles, buffers)
      iter.map(m => decodeStub(m, dims))
    }
  }

  /** Metadata + stub features per media row. Features are emitted as
    * scalar columns f0..f7 (sortable, so the driver comparator can gate
    * them) built from the cross-engine hash — fully oracle-checkable in
    * DuckDB. Raw-ARRAY semantics stay spec'd in StreamingSpec
    * (mapPartitions path) and CustomOpsSpec (decodeStubExpr: length,
    * [0,1) range, determinism). */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val dims = 8
    val feats = (0 until dims).map(i => stubFeature(col("payload"), i).as(s"f$i"))
    val norm = sqrt((0 until dims).map(i => col(s"f$i") * col(s"f$i"))
      .reduce(_ + _)).as("feature_norm")
    asMedia(Tables.documents(spark, dir))
      .withColumn("size_bytes", length(col("payload")))
      .select(Seq(col("doc_id"), col("mime"), col("size_bytes")) ++ feats: _*)
      .select(col("*"), norm)
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin: payload = UTF-8 bytes of text, so hashing text‖i in
    * DuckDB hashes the same bytes (TextFns.md5u56Sql). The norm sums
    * left-to-right like the Spark column fold, so doubles are
    * bit-identical. */
  def oMultimodalFeatures: String = {
    val dims = 8
    val feats = (0 until dims).map(i =>
      s"CAST(${graft.functions.TextFns.md5u56Sql(s"text || '$i'")} % 100000 AS DOUBLE) / 100000.0 AS f$i")
      .mkString(",\n    ")
    val norm = "sqrt(" + (0 until dims).map(i => s"f$i * f$i").mkString(" + ") + ") AS feature_norm"
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
       |         ELSE 'video/mp4' END AS mime,
       |    CAST(octet_length(encode(text)) AS INTEGER) AS size_bytes,
       |    $feats
       |  FROM documents)
       |SELECT doc_id, mime, size_bytes, ${(0 until dims).map(i => s"f$i").mkString(", ")},
       |  $norm
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** STUB resize: cap the payload at `maxBytes` before decoding — the
    * binary-slice expression is the real plumbing (a codec resize slots
    * into the same projection); downstream stages see a bounded-size
    * column, which is what matters for batch memory at scale. */
  def resizeStubExpr(payload: Column, maxBytes: Int = 256): Column =
    substring(payload, 1, maxBytes)

  case class Frame(doc_id: Long, frame_idx: Int, size_bytes: Int,
      features: Array[Double])

  /** STUB frame-sample: one row per sampled "frame" (fixed-stride byte
    * window standing in for every-nth-frame extraction). flatMap is the
    * exploding batch shape — media rows fan out to frame rows inside the
    * executor, never on the driver, and downstream operators see plain
    * rows they can shuffle/aggregate like any other. */
  def sampleFramesStub(m: Media, frameBytes: Int = 64,
      stride: Int = 256, dims: Int = 8): Seq[Frame] = {
    val idxs = 0 until math.max(1, (m.payload.length + stride - 1) / stride)
    idxs.map { fi =>
      val from = fi * stride
      val until = math.min(from + frameBytes, m.payload.length)
      val window = java.util.Arrays.copyOfRange(m.payload, math.min(from, m.payload.length), until)
      val feats = Array.tabulate(dims) { i =>
        var h = 1125899906842597L + i
        var j = 0
        while (j < window.length) { h = 31 * h + window(j); j += 1 }
        math.abs(h % 100000L) / 100000.0
      }
      Frame(m.doc_id, fi, window.length, feats)
    }
  }

  def sampleFramePartitions(media: Dataset[Media]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap(m => sampleFramesStub(m))
  }
}
