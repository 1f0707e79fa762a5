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

  /** STUB decode: deterministic pseudo-features from payload hashes —
    * stands in for decode→resize→embed. Expression form (codegen'd). */
  def decodeStubExpr(payload: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => (pmod(xxhash64(payload, i), lit(100000L)).cast("double") / lit(100000.0)))

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

  /** Rows-only query: metadata + stub-feature digest + norm per media row.
    * The raw array<double> is digested to a sortable scalar
    * (xxhash64 of its JSON form) because downstream comparators can't
    * order array columns; raw-array semantics are spec'd in
    * StreamingSpec (mapPartitions path) and CustomOpsSpec
    * (decodeStubExpr: length, [0,1) range, determinism). */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    asMedia(Tables.documents(spark, dir))
      .withColumn("size_bytes", length(col("payload")))
      .withColumn("features", decodeStubExpr(col("payload")))
      .withColumn("feature_norm", sqrt(aggregate(
        transform(col("features"), x => x * x), lit(0.0), (a, x) => a + x)))
      .select(col("doc_id"), col("mime"), col("size_bytes"),
        xxhash64(to_json(col("features"))).as("features_digest"),
        col("feature_norm"))
      .orderBy(col("doc_id"))

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
