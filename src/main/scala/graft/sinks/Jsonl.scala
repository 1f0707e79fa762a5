package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus export — the interchange format trainers and labeling
  * tools actually consume (one JSON object per line, shardable, no
  * engine required to read it). Parquet stays the processing format;
  * this is the hand-off sink at the END of a curation pipeline.
  *
  * Scale shape: `to_json(struct(*))` is a map-only projection;
  * sharding uses `repartition(n)` round-robin so shard sizes are even
  * regardless of upstream key skew (hash-partitioned exports inherit
  * hot-key skew into file sizes — the wrong default for a format whose
  * consumers read shards in parallel). The manifest derives from
  * reading the export back (file name + line count + byte count per
  * shard), so it reports what actually landed on disk, not what the
  * writer intended — the audit stance of Pipeline's parquet-gold
  * anti-join. */
object Jsonl {

  /** Write `docs` as `shards` JSONL files under `path`. Column order in
    * each JSON object follows the input schema; nulls are omitted by
    * Spark's JSON codec (standard JSONL practice). */
  def exportCorpus(docs: DataFrame, path: String, shards: Int): Unit =
    docs
      .select(to_json(struct(docs.columns.map(col).toIndexedSeq: _*)).as("value"))
      .repartition(shards)
      .write.mode("overwrite").text(path)

  /** Read an export back through an explicit schema (JSONL carries no
    * schema of its own — the reader must bring one, same contract as
    * every labeling tool). */
  def readBack(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.*"))

  /** Per-shard manifest measured from disk: rows and payload bytes
    * (excluding newlines) per file. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(input_file_name().as("shard"), length(col("value")).as("bytes"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("rows"), sum(col("bytes")).as("payload_bytes"))
      .orderBy(col("shard"))
}
