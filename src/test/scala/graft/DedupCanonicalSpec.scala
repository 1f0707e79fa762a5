package graft

import graft.operators.Dedup

/** Canonical selection: exactly one survivor per cluster, survivorship
  * rule enforced (longest doc, lowest id on ties), singletons keep
  * themselves, and nothing is lost — the verdict covers every doc. */
class DedupCanonicalSpec extends SparkSpecBase {

  test("one survivor per cluster; longest wins; total coverage") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val rows = Dedup.qDedupCanonical(spark, sf).collect()
    assert(rows.length == total, "every doc gets a verdict")
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rs) =>
      val kept = rs.filter(_.getInt(3) == 1)
      assert(kept.length == 1, s"cluster $cid must keep exactly one")
      val k = kept.head
      // survivor beats every dropped member on (n_chars desc, doc_id asc)
      rs.filter(_.getInt(3) == 0).foreach { d =>
        val better = d.getLong(2) > k.getLong(2) ||
          (d.getLong(2) == k.getLong(2) && d.getLong(0) < k.getLong(0))
        assert(!better, s"cluster $cid kept ${k.getLong(0)} over ${d.getLong(0)}")
      }
      // the cluster id is the minimum member id (CC contract + coalesce)
      assert(cid == rs.map(_.getLong(0)).min)
    }
    // singletons (clusters of one) keep themselves
    val singles = byCluster.filter(_._2.length == 1)
    assert(singles.nonEmpty)
    singles.values.foreach(rs => assert(rs.head.getInt(3) == 1))
    // the fixture contains at least one real multi-doc cluster
    assert(byCluster.exists(_._2.length > 1))
  }
}
