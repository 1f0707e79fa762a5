package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fuzzy entity matching: edit-distance near-pairs over an identifier
  * column (customer/vendor name reconciliation — the data-cleaning twin
  * of the document dedup family).
  *
  * Scale design: candidates come from FastSS deletion-neighborhood
  * blocking — each string keys on itself plus every single-character
  * deletion, and two strings within Levenshtein distance 1 ALWAYS share
  * a key (substitution: delete the differing position from both;
  * insert/delete: delete the extra char from the longer side). The pair
  * join therefore runs on short blocking keys, never name×name; the
  * exploded volume is (len+1) keys per row — linear — and candidates are
  * exact-verified with `levenshtein`, so blocking changes cost, never
  * results (the SimHash discipline, applied to strings). The n² brute
  * force exists only as the DuckDB oracle twin.
  */
object Entity {

  /** `{s} ∪ {s with char i removed}` — the distance-1 FastSS key set.
    * The per-char lambda runs interpreted, but over name-length arrays
    * (tens of chars) it is noise next to the join it feeds; the explode
    * itself is map-only. */
  private[graft] def deletionKeys(s: Column): Column =
    array_union(array(s), transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))))

  /** Pairs of rows whose `nameCol` values are within Levenshtein
    * distance 1 (ids ordered, exact distances attached). Complete by the
    * deletion-neighborhood argument above; `maxEdit` > 1 would need
    * k-deletion neighborhoods — refused rather than silently incomplete. */
  def editPairs(df: DataFrame, idCol: String, nameCol: String,
      maxEdit: Int = 1): DataFrame = {
    require(maxEdit == 1, "deletion-1 blocking is complete only for maxEdit = 1")
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"))
      .select(col("id"), col("name"), explode(deletionKeys(col("name"))).as("k"))
    keyed.as("a").join(keyed.as("b"), Seq("k"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      // distinct BEFORE verify: on this workload the candidate stream
      // carries ~1.5 duplicate key-collisions per pair (1.46M → 956k at
      // sf0.1), so deduping first skips a third of the levenshtein calls
      // and measured faster than verify-first (4.56 s vs 4.91 s); flip
      // the order if key multiplicity per pair is near 1 and the
      // verified survivor set is much smaller than the candidate set
      .distinct()
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= maxEdit)
  }

  def qCustomerEditPairs(spark: SparkSession, dir: String): DataFrame =
    editPairs(Tables.customer(spark, dir), "c_custkey", "c_name")
      .withColumnRenamed("id_a", "custkey_a")
      .withColumnRenamed("id_b", "custkey_b")
      .orderBy("custkey_a", "custkey_b")

  /** Brute-force twin: every pair, exact distance — blocking must
    * reproduce it exactly. */
  def oCustomerEditPairs: String =
    """SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
      |  a.c_name AS name_a, b.c_name AS name_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY custkey_a, custkey_b""".stripMargin
}
