package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Tokenizer fertility by language — the standard multilingual-tokenizer
  * diagnostic: how many surface tokens the tokenizer spends per word
  * (and how many characters each token covers) in each language. A
  * vocabulary tuned on one language shows inflated fertility on the
  * others (more tokens per word → fewer effective words per context
  * window → that language trains on less content per step), which is
  * why fertility tables sit next to every multilingual-corpus card.
  *
  * Uses the engine's BPE-ish surface tokenization
  * ([[TextFns.tokenCount]]) and whitespace words ([[TextFns.wordCount]]).
  * Ratios ride the integer-surrogate discipline (×100 then integer
  * division) so the gate is a bit-exact hash gate.
  *
  * Scale shape: one map-only scan (both counts are codegen'd
  * regexp/split expressions fused into it) into a |langs|-row partial
  * aggregate — map-side combine does all the reduction; nothing
  * shuffles but a handful of per-language partial sums. */
object Fertility {

  def fertilityByLang(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFns.tokenCount(col("text")).cast("long")).as("tokens"),
        sum(TextFns.wordCount(col("text")).cast("long")).as("words"),
        sum(col("n_chars")).as("chars"))
      .withColumn("tokens_per_100_words", expr("tokens * 100 div words"))
      .withColumn("chars_per_100_tokens", expr("chars * 100 div tokens"))

  def qFertilityByLang(spark: SparkSession, dir: String): DataFrame =
    fertilityByLang(Tables.documents(spark, dir)).orderBy(col("lang"))

  def oFertilityByLang: String =
    """WITH per AS (
      |  SELECT lang,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS t,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS w,
      |    n_chars
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(t) AS BIGINT) AS tokens,
      |  CAST(sum(w) AS BIGINT) AS words,
      |  CAST(sum(n_chars) AS BIGINT) AS chars,
      |  CAST(sum(t) * 100 // sum(w) AS BIGINT) AS tokens_per_100_words,
      |  CAST(sum(n_chars) * 100 // sum(t) AS BIGINT) AS chars_per_100_tokens
      |FROM per GROUP BY lang ORDER BY lang""".stripMargin
}
