package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Leakage-safe corpus split: train/val/test assignment where every
  * member of a near-dup cluster lands in the SAME split.
  *
  * Why this exists: the plain hash split ([[TextAnalysis.withSplit]])
  * is independent per document, so two near-duplicates can straddle
  * train and test — the classic eval-inflation leak that deduplication
  * papers warn about, and one that survives *within-split* dedup
  * entirely. The fix is to hash the cluster, not the document: each doc
  * is keyed by its near-dup cluster representative (the cluster's min
  * doc_id, from the same hash-min label propagation as
  * [[Dedup.dupClusters]]); singletons are their own representative, so
  * they keep the plain split's assignment distribution.
  *
  * Scale shape (100 TB): clustering cost = [[Dedup.dupClusters]] over
  * the candidate pairs (shuffles ∝ colliding pairs, rounds ∝ cluster
  * diameter); the assignment itself is a LEFT join of the corpus with
  * the (clustered docs only) label table — clustered docs are the rare
  * side — plus a map-only hash. No new shuffle class.
  */
object SafeSplit {

  def clusterSafeSplit(docs: DataFrame, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    val labels = Dedup.dupClusters(Dedup.shingleJaccardPairs(docs, 0.8))
      .select(col("doc_id"), col("cluster_id"))
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        pmod(TextFns.md5u56(col("rep_id").cast("string")), lit(100L))
          .cast("int"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("rep_id"), col("bucket"), col("split"))
  }

  def qClusterSafeSplit(spark: SparkSession, dir: String): DataFrame =
    clusterSafeSplit(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Twin: the oDedupClusters recursive-CTE closure for the labels,
    * then the oCorpusSplit hash CASE over the representative. */
  def oClusterSafeSplit: String = {
    val h = TextFns.md5u56Sql("CAST(rep_id AS VARCHAR)")
    raw"""WITH RECURSIVE w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(ws) >= 3
      |    THEN list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)])
      |    ELSE [array_to_string(ws, ' ')] END AS shingles FROM w),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.shingles, b.shingles))
      |      / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.8),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM p
      |  UNION SELECT doc_b, doc_a FROM p),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |labels AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |  FROM reach GROUP BY src),
      |assigned AS (
      |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS rep_id
      |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
      |SELECT doc_id, rep_id, CAST($h % 100 AS INTEGER) AS bucket,
      |  CASE WHEN $h % 100 < 80 THEN 'train'
      |       WHEN $h % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM assigned ORDER BY doc_id""".stripMargin
  }
}
