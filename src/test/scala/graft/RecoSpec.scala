package graft

import org.apache.spark.sql.functions._

import graft.operators.Reco

class RecoSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-computed co-purchase similarity and ranking") {
    // baskets: {1,2,3}, {1,2}, {1,3}, {2,4}
    // counts: 1→3, 2→3, 3→2, 4→1
    // co: (1,2)=2, (1,3)=2, (2,3)=1, (2,4)=1
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L),
      (40L, 2L), (40L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val out = Reco.itemSimilarity(li, minCo = 1, k = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(4 - 2), r.getLong(5), r.getInt(6)))).toMap
    // cos²(1,2) = ⌊1000·4/9⌋ = 444; cos²(1,3) = ⌊1000·4/6⌋ = 666
    assert(out((1L, 3L))._2 == 666L)
    assert(out((1L, 2L))._2 == 444L)
    // part 1's best neighbor is 3 (higher cosine), then 2
    assert(out((1L, 3L))._3 == 1 && out((1L, 2L))._3 == 2)
    // symmetry of the similarity value
    assert(out((3L, 1L))._2 == out((1L, 3L))._2)
  }

  test("fixture output: ranks contiguous per part, self-pairs absent") {
    val out = Reco.qItemSimilarity(spark, sf).cache()
    assert(out.filter(col("part") === col("other")).count() == 0)
    val badRank = out.groupBy(col("part"))
      .agg(max(col("rnk")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(badRank == 0, "ranks must be contiguous 1..n per part")
    assert(out.filter(col("cos2_milli") < 0 || col("cos2_milli") > 1000)
      .count() == 0)
  }
}
