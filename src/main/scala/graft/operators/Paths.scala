package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sequential path mining over sessions and degree structure over the
  * purchase graph.
  */
object Paths {

  val PathLen = 3
  val TopPaths = 15

  /** Top opening paths: each (user, day) session's first [[PathLen]]
    * event types in time order, counted across sessions — the
    * whole-prefix complement of [[Transitions]]' pairwise matrix
    * (a→b→c and a→c→b count apart here). One session-keyed window over
    * events, prefix assembly per session, a path-grain count, and a
    * TakeOrdered(15); sessions shorter than the prefix length are
    * skipped (no partial-path bucket to misread). */
  def topPaths(events: DataFrame, pathLen: Int = PathLen,
      k: Int = TopPaths): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val prefix = events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= pathLen)
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"),
        array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
      .filter(col("n") === pathLen)
    prefix.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_sessions").desc, col("path"))))
      .select(col("rank"), col("path"), col("n_sessions"))
  }

  def qTopPaths(spark: SparkSession, dir: String): DataFrame =
    topPaths(Tables.events(spark, dir)).orderBy(col("rank"))

  def oTopPaths: String =
    s"""WITH r AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT user_id, day,
      |    string_agg(event_type, '>' ORDER BY rn) AS path, count(*) AS n
      |  FROM r WHERE rn <= $PathLen GROUP BY user_id, day
      |  HAVING count(*) = $PathLen),
      |c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY path)
      |SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INTEGER)
      |         AS rank,
      |       path, CAST(n_sessions AS BIGINT) AS n_sessions
      |FROM c ORDER BY n_sessions DESC, path LIMIT $TopPaths""".stripMargin

  // ------------------------------------------------ degree distribution

  /** Log₂-bucketed degree distribution of the purchase graph — the
    * skew diagnostic that decides salting/broadcast choices before a
    * graph job runs. Bucket = bit-length of the out-degree (integer
    * exact in both engines via the binary-string length); one edge
    * aggregate + one ≤64-row rollup. */
  def degreeDistribution(edges: DataFrame): DataFrame = {
    val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    degrees
      .withColumn("degree_bits", length(bin(col("degree"))).cast("int"))
      .groupBy(col("degree_bits"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("degree")).as("min_degree"),
        max(col("degree")).as("max_degree"))
  }

  def qDegreeDistribution(spark: SparkSession, dir: String): DataFrame =
    degreeDistribution(Graph.purchaseEdges(
      Tables.orders(spark, dir), Tables.lineitem(spark, dir)))
      .orderBy(col("degree_bits"))

  def oDegreeDistribution: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (
      |  SELECT cust AS src FROM pairs
      |  UNION ALL SELECT supp AS src FROM pairs),
      |d AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
      |SELECT CAST(length(bin(degree)) AS INTEGER) AS degree_bits,
      |  CAST(count(*) AS BIGINT) AS n_nodes,
      |  CAST(min(degree) AS BIGINT) AS min_degree,
      |  CAST(max(degree) AS BIGINT) AS max_degree
      |FROM d GROUP BY 1 ORDER BY degree_bits""".stripMargin
}
