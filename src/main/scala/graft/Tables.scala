package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst handles column pruning
  * and predicate pushdown into the vectorized parquet reader, so callers
  * should express filters/projections declaratively rather than
  * pre-slicing paths (contrast with the reference's manual partition-path
  * string building, silver_processor.py:134-140).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet has shipped `ts` two ways across fixture generations:
    * TIMESTAMP(NANOS) (read as long under the legacy flag, truncated to
    * micros here) and TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ).
    * Normalize both to session-zone TIMESTAMP — sessions pin UTC, so the
    * wall-clock values (and every derived year/month/window) are identical
    * either way, and DuckDB's native read of the same file agrees. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  /** Fallback streaming schema when the landing directory has no files
    * to infer from yet — the current fixture shape (micros → NTZ). */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Streaming twin of `events`: file-source read of a landing directory.
    * Streaming readers must declare a schema; infer it from the files
    * already landed (a one-time control-plane footer read) so either
    * fixture generation streams correctly, then apply the same ts
    * normalization as the batch path. */
  def eventsStream(s: SparkSession, landingDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NonFatal, not just AnalysisException: a corrupt or half-written
    // producer file in the landing dir throws SparkException/IOException
    // from the footer read, and inference failing must degrade to the
    // declared fallback, not fail stream definition. The fallback is
    // logged because its NTZ ts only matches the current (micros)
    // fixture generation — if nanos-generation files land later, the
    // mismatch surfaces here, not as a silent bad cast downstream.
    val schema =
      try s.read.parquet(landingDir).schema
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"landing schema inference failed (${e.getClass.getSimpleName}: " +
              s"${e.getMessage}); using declared fallback eventsRawSchema")
          eventsRawSchema
      }
    normalizeTs(s.readStream.schema(schema).parquet(landingDir))
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
