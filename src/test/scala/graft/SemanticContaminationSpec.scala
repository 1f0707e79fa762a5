package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.TextFns

/** Planted-paraphrase checks for the embedding-level eval-contamination
  * scan: an eval vector identical to a train vector is flagged with
  * cosine 1; eval×eval duplicates are not contamination. */
class SemanticContaminationSpec extends SparkSpecBase {
  import spark.implicits._

  private def splitsOf(ids: Seq[Long]): Map[Long, String] =
    ids.toDF("vec_id")
      .withColumn("split",
        when(pmod(TextFns.md5u56(col("vec_id").cast("string")),
          lit(100L)) < 80, "train").otherwise("eval"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("planted train-copy is flagged; eval-only duplicates are not") {
    val splits = splitsOf(0L until 60L)
    val trainId = splits.collectFirst { case (id, "train") => id }.get
    val evalIds = splits.collect { case (id, "eval") => id }.toSeq.sorted
    assert(evalIds.size >= 3, "fixture ids yield too few eval docs")
    val v1 = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val v2 = Array.tabulate(8)(i => if (i == 1) 1f else 0f)
    val emb = Seq(
      (trainId, v1), // train original
      (evalIds(0), v1), // eval paraphrase of the train doc → contaminated
      (evalIds(1), v2), // eval duplicate pair, no train counterpart
      (evalIds(2), v2)).toDF("vec_id", "embedding")
    val out = Dedup.semanticContamination(emb).collect()
    assert(out.length == 1, out.mkString(","))
    assert(out.head.getAs[Long]("eval_id") == evalIds(0))
    assert(out.head.getAs[Long]("train_id") == trainId)
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }
}
