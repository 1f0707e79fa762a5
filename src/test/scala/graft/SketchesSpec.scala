package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Pins the two properties the 100 TB story rests on: both sketches
  * merge (shard independently, fold tiny artifacts) and the count-min
  * estimate never undercounts. */
class SketchesSpec extends SparkSpecBase {

  test("KMV: merged half-corpus signatures equal the whole-corpus signature") {
    val ev = Tables.events(spark, sf)
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    val whole = Sketches.kmvSig(ev, "event_type", "user_id")
      .select("event_type", "h")
    val merged = Sketches.kmvMerge(
      Sketches.kmvSig(a, "event_type", "user_id"),
      Sketches.kmvSig(b, "event_type", "user_id"), "event_type")
      .select("event_type", "h")
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("KMV estimate: exact below K, within 40% of exact above K") {
    val rows = Sketches.kmvDistinct(Tables.events(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kept, est, exact) = (r.getAs[Long]("k_kept"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      if (kept < Sketches.K) assert(est == exact, s"${r.getString(0)}: $est != $exact")
      else assert(math.abs(est - exact) * 100 <= 40 * exact,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("CMS: never undercounts, and half-corpus grids sum to the whole grid") {
    val docs = Tables.documents(spark, sf)
    val top = Sketches.cmsTopTerms(docs).collect()
    assert(top.length == 20)
    top.foreach(r => assert(r.getAs[Long]("overest") >= 0L, r.toString))

    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val whole = Sketches.cmsCells(counts(docs))
    val aCells = Sketches.cmsCells(counts(docs.filter(col("doc_id") % 2 === 0)))
    val bCells = Sketches.cmsCells(counts(docs.filter(col("doc_id") % 2 === 1)))
    val summed = aCells.union(bCells)
      .groupBy(col("i"), col("bucket")).agg(sum(col("cell")).as("cell"))
    assert(whole.exceptAll(summed).isEmpty && summed.exceptAll(whole).isEmpty)
  }
}
