package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.plans.BpeTokens
import graft.plans.BpeTokens.Bpe

/** Trained subword tokenization — BPE vocabulary learning plus the
  * corpus-wide tokenize pass every LLM data pipeline runs before
  * packing, budgeting, or mixture weighting (token counts, not char
  * counts, are the currency of training-data curation).
  *
  * Training (the sampled-k-means / NB-vocab discipline, one distributed
  * pass + a bounded collect): ONE word-count aggregation over the train
  * split — the only corpus-scale job — capped to the top `maxWords`
  * words by (count desc, word) via TakeOrdered, then the classic merge
  * loop (Sennrich 2016, arXiv:1508.07909) runs on the driver over that
  * bounded word-frequency table: count adjacent symbol pairs weighted
  * by word frequency, merge the most frequent pair (ties break
  * lexicographically so training is deterministic), repeat `numMerges`
  * times or until no pair occurs twice. At 100 TB the corpus pass is
  * unchanged (partial-agg word counts) and the driver loop still sees
  * at most `maxWords` rows — corpus size changes WHICH words are in the
  * head, not the cost of the loop.
  *
  * Apply: [[graft.plans.BpeTokens]] — a native codegen'd expression,
  * map-only over the corpus, model as a plan reference object.
  *
  * Oracle: generated AFTER training with the merge list inlined as a
  * VALUES table (the trained-quantizer pattern, `Classify.oracleEntries`).
  * The DuckDB twin replays the identical rank-order apply as a
  * recursive CTE over DISTINCT words — each recursion step applies one
  * merge rank via leftmost-non-overlapping string replacement on a
  * control-character-wrapped token string — then joins tokens back to
  * doc word positions. Everything compared is exact (counts, joined
  * token strings, md5), so the gate is a full hash match.
  */
object Tokenize {

  val NumMerges = 200
  val MaxWords = 20000

  /** One corpus pass + a bounded-collect merge loop. */
  def trainBpe(train: DataFrame, numMerges: Int = NumMerges,
      maxWords: Int = MaxWords): Bpe = {
    val wordCounts = train
      .select(explode(TextFns.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // words as codepoint-symbol vectors, weighted by frequency
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    var continue = true
    while (merges.length < numMerges && continue) {
      // adjacent-pair counts over every position (standard BPE counting)
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        val ((a, b), best) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (best < 2) continue = false
        else {
          merges += Array(a, b)
          // leftmost non-overlapping replacement — the exact apply rule
          vocab = vocab.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += a + b; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.toArray, c)
            }
          }
        }
      }
    }
    new Bpe(merges.toArray)
  }

  /** Per-doc tokenize summary: token count, the first 8 tokens, and an
    * md5 over the full '|'-joined token stream (an exact, hashable
    * stand-in for shipping the whole token array through the gate). */
  def tokenizeSummary(docs: DataFrame, model: Bpe): DataFrame = {
    val toks = BpeTokens.bpeTokens(TextFns.words(col("text")), model)
    docs
      .withColumn("toks", toks)
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        array_join(slice(col("toks"), 1, 8), "|").as("head_tokens"),
        md5(array_join(col("toks"), "|")).as("tok_md5"))
      .orderBy("doc_id")
  }

  /** Persist a trained model as a tab-separated merge list (rank order
    * is the line order). A tokenizer that cannot be saved pins serving
    * to the training JVM; this is the hand-off artifact a separate
    * serving/streaming cluster loads. Tabs/newlines cannot appear in
    * merge symbols (they come from whitespace-split words). */
  def saveModel(model: Bpe, path: java.nio.file.Path): Unit =
    java.nio.file.Files.write(path,
      model.merges.map(ab => s"${ab(0)}\t${ab(1)}")
        .mkString("", "\n", "\n").getBytes("UTF-8"))

  def loadModel(path: java.nio.file.Path): Bpe =
    new Bpe(java.nio.file.Files.readAllLines(path).toArray(Array.empty[String])
      .filter(_.nonEmpty)
      .map { line =>
        val t = line.split("\t", -1)
        require(t.length == 2, s"malformed merge line: $line")
        Array(t(0), t(1))
      })

  /** Models per dataset dir (training is deterministic; the cache only
    * skips recomputation — the `Classify.modelFor` discipline). */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, Bpe]()

  private[graft] def modelFor(spark: SparkSession, dir: String): Bpe =
    models.computeIfAbsent(dir, { d =>
      val split = TextAnalysis.withSplit(Tables.documents(spark, d))
      trainBpe(split.filter(col("split") === "train"))
    })

  /** Train on the deterministic train split, tokenize the whole corpus. */
  def qTokenize(spark: SparkSession, dir: String): DataFrame =
    tokenizeSummary(Tables.documents(spark, dir), modelFor(spark, dir))

  /** The single trained model this JVM has seen, if unambiguous — the
    * cache-to-oracle bridge (`Classify.cachedModel`). */
  def cachedModel: Option[Bpe] =
    if (models.size == 1) Some(models.values.iterator.next) else None

  def oracleEntries: Map[String, String] =
    cachedModel.filter(_.merges.nonEmpty)
      .map(m => Map("tokenize_bpe" -> oTokenize(m)))
      .getOrElse(Map.empty)

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The generated twin: merges as VALUES; recursion step r applies the
    * rank-r merge by replacing wrapped pair `⟨a⟩⟨b⟩` with `⟨ab⟩` —
    * wrapping every token in chr(2)/chr(3) makes occurrences
    * non-overlapping character-wise, so SQL's leftmost-global replace
    * IS the BPE token-level rule. */
  private[graft] def oTokenize(m: Bpe): String = {
    val L = m.merges.length
    val vals = m.merges.zipWithIndex.map { case (ab, i) =>
      s"(${i + 1}, ${sqlStr(ab(0))}, ${sqlStr(ab(1))})"
    }.mkString(", ")
    raw"""WITH RECURSIVE merges(rank, a, b) AS (VALUES $vals),
      |dw AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w,
      |    unnest(range(1, len(regexp_split_to_array(lower(trim(text)), '\s+')) + 1)) AS pos
      |  FROM documents),
      |words AS (SELECT DISTINCT w FROM dw WHERE w <> ''),
      |bpe(w, toks, step) AS (
      |  SELECT w, regexp_replace(w, '(.)', chr(2) || '\1' || chr(3), 'g'), 0 FROM words
      |  UNION ALL
      |  SELECT b.w,
      |    replace(b.toks, chr(2) || m.a || chr(3) || chr(2) || m.b || chr(3),
      |            chr(2) || m.a || m.b || chr(3)),
      |    b.step + 1
      |  FROM bpe b JOIN merges m ON m.rank = b.step + 1),
      |wtok AS (
      |  SELECT w,
      |    replace(replace(replace(toks, chr(3) || chr(2), '|'), chr(2), ''), chr(3), '') AS tokstr
      |  FROM bpe WHERE step = $L),
      |per_doc AS (
      |  SELECT dw.doc_id,
      |    string_agg(tokstr, '|' ORDER BY pos) AS cat,
      |    CAST(sum(len(string_split(tokstr, '|'))) AS INT) AS n
      |  FROM dw JOIN wtok ON dw.w = wtok.w
      |  WHERE dw.w <> ''
      |  GROUP BY dw.doc_id)
      |SELECT d.doc_id,
      |  coalesce(n, 0) AS n_tokens,
      |  array_to_string(string_split(coalesce(cat, ''), '|')[1:8], '|') AS head_tokens,
      |  md5(coalesce(cat, '')) AS tok_md5
      |FROM documents d LEFT JOIN per_doc p USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }
}
