package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Rendezvous (highest-random-weight) partition assignment — the
  * consistent-hashing primitive that makes cluster RESIZE cheap: a key
  * goes to the bucket maximizing hash(key, bucket), so growing B → B+1
  * moves only the ~1/(B+1) of keys whose new bucket wins, while naive
  * `key mod B` reshuffles almost everything. The table reports each
  * doc's assignment under [[B]] and [[B]]+1 buckets plus the moved flag
  * — the re-shard cost, as data (spec pins rendezvous movement ≪ mod
  * movement).
  *
  * Exact integers end to end: the weight is the cross-engine 56-bit
  * md5 surrogate of `key:bucket`, the argmax is a pinned-order window.
  * Scale shape: ×B fan-out per key with B a small constant (shard
  * counts, not data); the argmax is a key-partitioned window. */
object Rendezvous {

  val B = 16

  /** Winning bucket per key for a given bucket count. */
  private def assign(keys: DataFrame, buckets: Int, out: String): DataFrame = {
    val exploded = keys
      .withColumn("b", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("h", TextFns.md5u56(
        concat(col("doc_id").cast("string"), lit(":"), col("b").cast("string"))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("h").desc, col("b"))
    exploded.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("b").as(out))
  }

  def rendezvousResize(docs: DataFrame): DataFrame = {
    val keys = docs.select(col("doc_id"))
    assign(keys, B, "bucket_before")
      .join(assign(keys, B + 1, "bucket_after"), Seq("doc_id"))
      .withColumn("moved", col("bucket_before") =!= col("bucket_after"))
      .withColumn("mod_moved",
        (col("doc_id") % B) =!= (col("doc_id") % (B + 1)))
      .select(col("doc_id"), col("bucket_before"), col("bucket_after"),
        col("moved"), col("mod_moved"))
  }

  def qRendezvousResize(spark: SparkSession, dir: String): DataFrame =
    rendezvousResize(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  def oRendezvousResize: String = {
    def leg(buckets: Int, out: String): String = {
      val h = TextFns.md5u56Sql(
        "(CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))")
      s"""SELECT doc_id, b AS $out FROM (
         |  SELECT doc_id, b, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY ($h) DESC, b) AS rn
         |  FROM documents, unnest(range(0, $buckets)) AS u(b))
         |WHERE rn = 1""".stripMargin
    }
    s"""WITH before AS (${leg(B, "bucket_before").replace("\n", "\n      |")}),
      |after AS (${leg(B + 1, "bucket_after").replace("\n", "\n      |")})
      |SELECT b1.doc_id,
      |  CAST(b1.bucket_before AS INTEGER) AS bucket_before,
      |  CAST(b2.bucket_after AS INTEGER) AS bucket_after,
      |  b1.bucket_before != b2.bucket_after AS moved,
      |  (b1.doc_id % $B) != (b1.doc_id % ${B + 1}) AS mod_moved
      |FROM before b1 JOIN after b2 USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }
}
