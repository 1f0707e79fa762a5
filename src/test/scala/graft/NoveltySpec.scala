package graft

import org.apache.spark.sql.functions._

import graft.operators.{Novelty, TextAnalysis}

class NoveltySpec extends SparkSpecBase {
  import spark.implicits._

  test("novelty counts exactly the shingles absent from the train vocabulary") {
    // build a corpus where the split assignment is KNOWN (probe the real
    // md5 split), then plant: one incoming doc fully novel, one fully
    // known (copies a train doc), one half-and-half
    val probe = TextAnalysis.withSplit(
      (0L until 200L).toDF("doc_id").withColumn("text", lit("x")))
      .select($"doc_id", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val trainIds = probe.filter(_._2 == "train").keys.toSeq.sorted
    val testIds = probe.filter(_._2 != "train").keys.toSeq.sorted
    assert(trainIds.size >= 1 && testIds.size >= 3)
    val trainText = "alpha beta gamma delta epsilon" // 3 shingles
    val rows = Seq(
      (trainIds.head, trainText),
      (testIds(0), trainText),                        // fully known
      (testIds(1), "zeta eta theta iota kappa"),      // fully novel (3 shingles)
      (testIds(2), "alpha beta gamma nu xi"))         // shares 1 of 3
      .toDF("doc_id", "text")
    val got = Novelty.noveltyVsTrain(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(testIds(0)) == ((0L, 0L)), s"known doc ${got(testIds(0))}")
    assert(got(testIds(1)) == ((3L, 10000L)), s"novel doc ${got(testIds(1))}")
    // 'alpha beta gamma' is the only known shingle; 'beta gamma nu' and
    // 'gamma nu xi' are novel → 2 of 3 → 6666 bp
    assert(got(testIds(2)) == ((2L, 6666L)), s"half doc ${got(testIds(2))}")
    // train docs are scored never
    assert(!got.contains(trainIds.head))
  }

  test("fixture invariants: bp bounded, zero-novelty docs present not dropped") {
    val out = Novelty.qNoveltyVsTrain(spark, sf).collect()
    val tagged = TextAnalysis.withSplit(Tables.documents(spark, sf))
    assert(out.length == tagged.filter($"split" =!= "train").count())
    out.foreach { r =>
      val bp = r.getLong(4)
      assert(bp >= 0L && bp <= 10000L, s"novelty_bp out of range: $bp")
      assert(r.getLong(3) <= r.getLong(2), "novel > total shingles")
    }
  }
}
