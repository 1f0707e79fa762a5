package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Positional-index phrase search — the retrieval primitive BM25
  * ([[Retrieval]]) can't express: "these terms, CONSECUTIVE, in order".
  * The index is the classic positional postings list (term → (doc, pos));
  * a phrase of m terms matches at start position p iff term i has a
  * posting at p+i for all i, i.e. an m-way equi-join after normalizing
  * each leg's position to its implied start (pos − i). The query phrase
  * is the corpus's most frequent word trigram (count-desc, then
  * lexicographic — fully deterministic), so the operator is
  * self-contained on any corpus.
  *
  * Scale shape (100 TB): each leg filters the postings to ONE term
  * before anything shuffles (at real scale: a partition-pruned read of a
  * term-bucketed index, the [[Retrieval.writeIndex]] layout plus a pos
  * column), then the legs equi-join on (doc_id, start) — rarest-term
  * leg first would broadcast when selective. Cost scales with the
  * matched terms' posting lists, never with corpus size. The trigram
  * mining leg is one explode + partial-agg count shuffle; its top-1 is a
  * TakeOrdered(1) control-plane collect.
  */
object Phrase {

  /** Positional postings (doc_id, wpos, word) — map-only explode. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(TextFns.words(col("text"))).as(Seq("wpos", "word")))

  /** Most frequent word trigram, ties broken lexicographically. */
  def topTrigram(docs: DataFrame): Seq[String] = {
    val top = Spans.windows(docs, k = 3)
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(1).collect()
    top.head.getString(0).split(" ").toSeq
  }

  /** Docs containing the exact consecutive phrase, with occurrence
    * counts: m-way positional join on the normalized start position. */
  def phraseHits(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val p = postings(docs)
    val legs = terms.zipWithIndex.map { case (t, i) =>
      p.filter(col("word") === t)
        .select(col("doc_id"), (col("wpos") - i).as("start"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("phrase", lit(terms.mkString(" ")))
      .select(col("doc_id"), col("phrase"), col("n_hits"))
  }

  def qPhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    phraseHits(docs, topTrigram(docs)).orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- serving path

  /** Persist the positional postings term-range-laid-out (the
    * [[Retrieval.writeIndex]] layout plus the position column): each
    * parquet file covers a disjoint term range, so a phrase query's
    * per-term scan prunes on file min/max stats instead of reading the
    * corpus. */
  def writePositionalIndex(docs: DataFrame, path: String, nFiles: Int = 8): Unit =
    postings(docs)
      .repartitionByRange(nFiles, col("word"))
      .sortWithinPartitions(col("word"), col("doc_id"), col("wpos"))
      .write.mode("overwrite").parquet(path)

  /** Phrase hits from the persisted index — identical join shape to
    * [[phraseHits]], but each term leg is a pruned index read; document
    * text is never touched. Results identical by construction (same
    * postings, same joins), so the query shares [[oPhraseSearch]]. */
  def phraseHitsFromIndex(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    val p = spark.read.parquet(path)
    val legs = terms.zipWithIndex.map { case (t, i) =>
      p.filter(col("word") === t)
        .select(col("doc_id"), (col("wpos") - i).as("start"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("phrase", lit(terms.mkString(" ")))
      .select(col("doc_id"), col("phrase"), col("n_hits"))
  }

  private def indexFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("phrase_index", dir) { path =>
      writePositionalIndex(Tables.documents(spark, dir), path)
    }

  def qPhraseSearchServing(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    phraseHitsFromIndex(spark, indexFor(spark, dir), topTrigram(docs))
      .orderBy(col("doc_id"))
  }

  def oPhraseSearch: String =
    raw"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT array_to_string(ws[i+1 : i+3], ' ') AS gram
      |  FROM w, unnest(range(0, greatest(len(ws) - 2, 0))) AS t(i)),
      |top1 AS (
      |  SELECT gram FROM g GROUP BY gram
      |  ORDER BY count(*) DESC, gram LIMIT 1),
      |ts AS (SELECT regexp_split_to_array(gram, ' ') AS t FROM top1),
      |p AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS wpos, ws[i+1] AS word
      |  FROM w, unnest(range(0, len(ws))) AS t(i)),
      |m AS (
      |  SELECT p0.doc_id, p0.wpos
      |  FROM p p0, p p1, p p2, ts
      |  WHERE p0.word = ts.t[1] AND p1.word = ts.t[2] AND p2.word = ts.t[3]
      |    AND p1.doc_id = p0.doc_id AND p1.wpos = p0.wpos + 1
      |    AND p2.doc_id = p0.doc_id AND p2.wpos = p0.wpos + 2)
      |SELECT doc_id, (SELECT gram FROM top1) AS phrase,
      |       CAST(count(*) AS BIGINT) AS n_hits
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
