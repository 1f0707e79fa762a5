package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Rollup

/** Incremental rollup maintenance: merged partials must be
  * indistinguishable from a from-scratch recompute, for any batch split
  * and any merge order. */
class RollupSpec extends SparkSpecBase {

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("merge of colliding-group partials equals from-scratch recompute") {
    val ev = Tables.events(spark, sf)
    // user-hash split: every (event_type, day) group appears in BOTH
    // slices, so every group exercises the merge path
    val bucket = pmod(graft.functions.TextFns.md5u56(col("user_id").cast("string")), lit(100L))
    val merged = Rollup.finish(Rollup.merge(
      Rollup.partial(ev.filter(bucket < 80)),
      Rollup.partial(ev.filter(bucket >= 80))))
    val scratch = Rollup.finish(Rollup.partial(ev))
    assert(same(merged, scratch))
  }

  test("merge is associative across three arrival batches") {
    val ev = Tables.events(spark, sf)
    val third = pmod(col("user_id"), lit(3))
    val Seq(a, b, c) =
      (0 to 2).map(i => Rollup.partial(ev.filter(third === i)))
    val leftFold = Rollup.finish(Rollup.merge(Rollup.merge(a, b), c))
    val rightFold = Rollup.finish(Rollup.merge(a, Rollup.merge(b, c)))
    val scratch = Rollup.finish(Rollup.partial(ev))
    assert(same(leftFold, scratch) && same(rightFold, scratch))
  }
}
