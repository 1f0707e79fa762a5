package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** CSV and JSON-lines as FIRST-CLASS sources, gated end-to-end: the
  * corpus is exported once per dataset (build-once serving registry),
  * read back through Spark's csv/json readers with an EXPLICIT schema,
  * and the read path is oracle-gated against the parquet ground truth —
  * so quoting, escaping, header and type handling are all under the
  * hash gate, not just "a file was written".
  *
  * Rules that matter at 100 TB:
  *  - explicit schema, never inferSchema — inference is a full extra
  *    pass over the data and makes the pipeline's types depend on
  *    whatever happened to land first;
  *  - quote + escape pinned (quote-doubling for embedded quotes, the
  *    RFC-4180 default DuckDB also speaks);
  *  - FAILFAST read mode: a malformed row in a landing feed should stop
  *    the load, not silently null-out columns (the tolerant path is
  *    Bronze.readBronzeTolerant, a deliberate choice, not a default);
  *  - text files split by line, so parallelism survives the format —
  *    but numbers/timestamps cost parse CPU parquet never pays, which
  *    is why these are LANDING formats: everything downstream of bronze
  *    stays columnar. */
object TextFormats {

  val docsCsvSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def csvLayoutFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("docs_csv", dir) { path =>
      Tables.documents(spark, dir)
        .write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        // BOTH sides of the codec trim cell whitespace by default —
        // data-mangling for a text corpus; pinned off on write and read
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    }

  def jsonlLayoutFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("docs_jsonl", dir) { path =>
      Tables.documents(spark, dir)
        .write.mode("overwrite").json(path)
    }

  def readDocsCsv(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docsCsvSchema)
      .option("header", "true").option("mode", "FAILFAST")
      // the writer legally emits QUOTED embedded newlines; without
      // multiLine the reader splits records mid-cell and FAILFAST aborts
      // (ADVICE r9 — the spec's newline round-trip only passes WITH it)
      .option("multiLine", "true")
      // the reader TRIMS cell whitespace by default — data-mangling for
      // a text corpus (measured: trailing spaces silently dropped)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(csvLayoutFor(spark, dir))

  def readDocsJsonl(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docsCsvSchema)
      .option("mode", "FAILFAST")
      .json(jsonlLayoutFor(spark, dir))

  /** ORC — the OTHER columnar format Spark ships natively (a warehouse
    * migrating from Hive hands you ORC, not parquet). Same gate shape:
    * export once, read back, digest against parquet truth. Predicate
    * pushdown/column pruning work as with parquet (PLANS-visible). */
  def orcLayoutFor(spark: SparkSession, dir: String): String =
    graft.Serving.buildOnce("docs_orc", dir) { path =>
      Tables.documents(spark, dir).write.mode("overwrite").orc(path)
    }

  def readDocsOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docsCsvSchema).orc(orcLayoutFor(spark, dir))

  def qOrcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    sourceDigest(readDocsOrc(spark, dir)).orderBy(col("source"))

  /** Per-source totals computed FROM THE CSV READ — any quoting/escape
    * corruption of text or keys lands in the fingerprint sum and fails
    * the gate, row counts alone would not catch a mangled column. */
  private def sourceDigest(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(length(col("text"))).as("total_text_len"),
        sum(col("doc_id")).as("id_sum"))

  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame =
    sourceDigest(readDocsCsv(spark, dir)).orderBy(col("source"))

  def qJsonlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    sourceDigest(readDocsJsonl(spark, dir)).orderBy(col("source"))

  /** Twin reads the PARQUET ground truth — equality proves the full
    * export→read cycle preserved every row and column. */
  def oRoundtrip: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS total_text_len,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
}
