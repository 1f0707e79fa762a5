package graft

import java.nio.file.{Files, Paths}

import graft.operators.Graph

/** VERDICT r12 item 4: the graph family over the build-once persisted
  * edge projections — results identical to the inline queries (so they
  * share the inline DuckDB twins), one shared artifact for all three,
  * and no rebuild on re-read. */
class GraphServingSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("serving queries equal their inline twins row-for-row") {
    assert(rows(Graph.qPageRankServing(spark, sf)) ==
      rows(Graph.qPageRank(spark, sf)), "pagerank")
    assert(rows(Graph.qBfsReachServing(spark, sf)) ==
      rows(Graph.qBfsReach(spark, sf)), "bfs reach")
    assert(rows(Graph.qTrianglesServing(spark, sf)) ==
      rows(Graph.qTriangles(spark, sf)), "triangles")
  }

  test("one artifact serves all three; a re-read does not rebuild") {
    val path = Graph.edgesArtifactFor(spark, sf)
    assert(Files.exists(Paths.get(path, "purchase")))
    assert(Files.exists(Paths.get(path, "copurchase")))
    def newest(): Long = {
      val s = Files.walk(Paths.get(path))
      try s.filter(Files.isRegularFile(_))
        .mapToLong(p => Files.getLastModifiedTime(p).toMillis)
        .reduce(-1L, Math.max)
      finally s.close()
    }
    val before = newest()
    // both a second artifact resolution and a serving query re-run must
    // leave every artifact file untouched (build amortization is the
    // point of the layout)
    Graph.edgesArtifactFor(spark, sf)
    Graph.qTrianglesServing(spark, sf).collect()
    assert(newest() == before, "artifact was rebuilt on re-read")
  }
}
