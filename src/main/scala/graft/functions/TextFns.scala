package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression builders for the training-data-pipeline
  * operators (SURVEY §7.2 M6): tokenization, quality ratios, language-ID
  * scoring, shingling, fingerprints. All pure Catalyst expressions
  * (codegen'd); regexes restricted to the dialect subset shared by Java
  * and DuckDB/RE2 so oracle twins behave identically.
  */
object TextFns {

  /** Whitespace word tokens of the lowercased, trimmed text. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  def wordCount(text: Column): Column = size(words(text))

  /** BPE-ish surface tokens: runs of alphanumerics or single symbols. */
  val TokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
  def tokenCount(text: Column): Column = regexp_count(text, lit(TokenPattern))

  /** ⌊log₂ c⌋ for a positive integral column as `length(bin(c)) − 1` —
    * no libm call, bit-identical to the DuckDB twin expression
    * `length(bin(c)) - 1`. The shared form of the idiom inlined across
    * the bucketing operators (review r16: each hand-inlined copy is a
    * Spark/DuckDB drift point). Caller guards non-positive inputs. */
  def log2Floor(c: Column): Column = length(bin(c)) - 1

  def punctCount(text: Column): Column = regexp_count(text, lit("[^A-Za-z0-9\\s]"))
  def capsCount(text: Column): Column = regexp_count(text, lit("[A-Z]"))

  /** Characters excluding whitespace / word count. */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")) / wordCount(text)

  /** Corpus quality thresholds — the single source of truth shared by
    * TextAnalysis.qTextStats' is_quality flag, Curation's filter funnel,
    * and both of their DuckDB oracle twins (interpolated into the SQL),
    * so a threshold tune can never make the two verdicts drift apart. */
  val QualityMinChars = 100
  val QualityMaxChars = 1000
  val QualityMinStopwordRatio = 0.02
  val QualityMaxPunctRatio = 0.3
  val QualityMaxRepetitionRatio = 0.2

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht")
  val EsStopwords: Seq[String] = Seq("el", "la", "de", "que", "y", "los")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "et", "est", "une")

  def stopwordCount(text: Column, stops: Seq[String]): Column =
    stopwordCountFromWords(words(text), stops)

  /** Stopword count over an already-materialized words-array ATTRIBUTE —
    * same two-stage rule as [[shinglesFromWords]]: when the caller has
    * `ws` projected anyway, passing `words(text)` inline instead would
    * run the split regex a second time per row. */
  def stopwordCountFromWords(ws: Column, stops: Seq[String]): Column = {
    val arr = array(stops.map(lit): _*)
    size(filter(ws, w => array_contains(arr, w)))
  }

  /** Stopword-profile language ID: score each language's stopword list,
    * argmax with fixed tiebreak order en > de > es > fr. */
  def langScores(text: Column): Map[String, Column] = Map(
    "en" -> stopwordCount(text, EnStopwords),
    "de" -> stopwordCount(text, DeStopwords),
    "es" -> stopwordCount(text, EsStopwords),
    "fr" -> stopwordCount(text, FrStopwords))

  def langId(sEn: Column, sDe: Column, sEs: Column, sFr: Column): Column =
    when(sEn >= sDe && sEn >= sEs && sEn >= sFr, "en")
      .when(sDe >= sEs && sDe >= sFr, "de")
      .when(sEs >= sFr, "es")
      .otherwise("fr")

  /** Normalized-text MD5 fingerprint (whitespace-collapsed, lowercased). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Distinct n-word shingles from an already-materialized words-array
    * ATTRIBUTE. Pass a projected column, not `words(text)` inline: the
    * lambda's element_at calls would otherwise re-evaluate the split per
    * element (O(words²) regex work per doc — measured 17 s vs <1 s on a
    * 5 k-doc corpus). */
  def shinglesFromWords(ws: Column, n: Int = 3): Column =
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))))
      .otherwise(array(concat_ws(" ", ws)))

  /** Convenience form for literals/tests; see shinglesFromWords for the
    * two-stage form used on real corpora. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromWords(words(text), n)

  /** Ordered (non-distinct) shingle sequence — winnowing needs document
    * order preserved, so no array_distinct. */
  def shingleSeqFromWords(ws: Column, n: Int = 3): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", ws)))

  /** 56-bit cross-engine hash: the first 7 md5 digest bytes, big-endian
    * (= first 14 hex chars as an integer). Fits BIGINT exactly in both
    * engines, so every hash-derived operator that uses it (winnowing,
    * simhash) is reproducible in the DuckDB oracle via [[md5u56Sql]] —
    * unlike xxhash64/murmur3, which have no DuckDB counterpart. */
  def md5u56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** DuckDB twin of [[md5u56]]: byte-swap of md5_number_upper's
    * little-endian low 7 bytes back to big-endian. */
  def md5u56Sql(arg: String): String =
    "CAST(" + (0 to 6).map(i =>
      s"((md5_number_upper($arg) >> ${8 * i}) & 255) * ${1L << (8 * (6 - i))}")
      .mkString("(", " + ", ")") + " AS BIGINT)"

  /** Per-shingle rolling hashes, order preserved. Project this as its
    * own attribute before windowing (lambda re-evaluation note above). */
  def shingleHashes(shingleSeq: Column): Column =
    transform(shingleSeq, s => md5u56(s))

  /** Winnowing fingerprint (MOSS-style rolling selection): slide a
    * window of `w` hashes over the ordered sequence, keep each window's
    * minimum, dedup. Guarantees any shared run of w+n-1 words between
    * two documents contributes at least one common fingerprint, while
    * storing ~2/(w+1) of the hashes — the document-local sketch for
    * plagiarism-style overlap detection. `hashes` must be a materialized
    * ATTRIBUTE or the hash transform re-evaluates per window. */
  def winnowingFromHashes(hashes: Column, w: Int = 4): Column =
    array_distinct(
      when(size(hashes) >= w,
        transform(sequence(lit(0), size(hashes) - w),
          i => array_min(slice(hashes, i + 1, lit(w)))))
        .otherwise(array(array_min(hashes))))
}
