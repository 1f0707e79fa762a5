package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TextFormats

class TextFormatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("csv round-trips quotes, commas, newlines and unicode exactly") {
    val nasty = Seq(
      (1L, "plain text", "en", "s0", 10L),
      (2L, "comma, inside", "en", "s0", 13L),
      (3L, "a \"quoted\" word", "en", "s1", 15L),
      (4L, "line\nbreak and\r\ncrlf", "de", "s1", 20L),
      (5L, "trailing space  ", "fr", "s2", 16L),
      (6L, "uni: é ☃ 中文", "zh", "s2", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-csv").toString
    nasty.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = spark.read.schema(TextFormats.docsCsvSchema)
      .option("header", "true").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "FAILFAST").csv(dir)
    val a = nasty.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"lost rows: ${a.diff(b)} gained: ${b.diff(a)}")
  }

  test("PRODUCTION csv reader survives embedded newlines (ADVICE r9)") {
    // a corpus text containing a newline is legal; the writer quotes it,
    // so readDocsCsv must speak multiLine or FAILFAST aborts mid-cell
    val dir = Files.createTempDirectory("graft-csv-prod").toString
    Seq(
      (1L, "first line\nsecond line", "en", "s0", 22L),
      (2L, "plain", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val back = TextFormats.readDocsCsv(spark, dir)
    assert(back.count() == 2)
    assert(back.filter(col("doc_id") === 1L).head().getString(1)
      == "first line\nsecond line")
  }

  test("failfast read rejects a malformed csv row instead of nulling it") {
    val dir = Files.createTempDirectory("graft-csv-bad").toString
    Files.writeString(java.nio.file.Path.of(dir, "part-0.csv"),
      "doc_id,text,lang,source,n_chars\nnot_a_number,x,en,s0,5\n")
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.schema(TextFormats.docsCsvSchema)
        .option("header", "true").option("mode", "FAILFAST")
        .csv(dir).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed")
      || Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("fixture corpus survives both landing formats column-for-column") {
    val truth = Tables.documents(spark, sf)
    val csv = TextFormats.readDocsCsv(spark, sf)
    val json = TextFormats.readDocsJsonl(spark, sf)
    assert(csv.count() == truth.count() && json.count() == truth.count())
    // exceptAll in both directions over full rows
    assert(csv.exceptAll(truth).count() == 0 && truth.exceptAll(csv).count() == 0)
    assert(json.exceptAll(truth).count() == 0 && truth.exceptAll(json).count() == 0)
  }
}
