package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** VERDICT r12 item 3: the exhaustive-ANN top-k selection must be
  * MERGEABLE — each input partition contributes at most k·Refine rows
  * per query to the exchange, so shuffle volume scales with the ANSWER
  * (|Q|·k·Refine·partitions), never the corpus (|Q|·N).
  *
  * Spark's own InferWindowGroupLimit already provides exactly this: a
  * `Filter(rank ≤ limit)` directly above a row_number Window plans as
  * WindowGroupLimit(Partial) BELOW the query_id exchange (a bounded
  * per-partition top-limit pass) plus WindowGroupLimit(Final) above it.
  * These specs PIN that shape — structurally (Partial below the
  * exchange in the executed plan) and behaviorally (measured shuffle
  * records bounded by the answer, not the candidate count) — so a
  * refactor that breaks the inference (e.g. a non-rank expression
  * between Filter and Window) fails loudly instead of silently
  * regressing the exchange to |Q|·N rows.
  */
class TopKShufflePlanSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The Partial group limit must sit BELOW the query_id hash exchange
    * (plan text prints parents first, so the Partial line must come
    * after the Exchange line). */
  private def assertPartialBelowExchange(name: String, df: DataFrame,
      limit: Int): Unit = {
    val lines = planOf(df).linesIterator.toIndexedSeq
    val ex = lines.indexWhere(_.contains("Exchange hashpartitioning(query_id"))
    assert(ex >= 0, s"$name: no query_id exchange found:\n${lines.mkString("\n")}")
    val part = lines.indexWhere(l => l.contains("WindowGroupLimit") &&
      l.contains(s"row_number(), $limit, Partial"))
    assert(part > ex,
      s"$name: WindowGroupLimit($limit, Partial) must sit below the " +
        s"query_id exchange (partial at line $part, exchange at $ex):\n" +
        lines.mkString("\n"))
  }

  test("exhaustive sweeps plan a Partial group limit below the query_id exchange") {
    val emb = Tables.embeddings(spark, sf)
    assertPartialBelowExchange("brute_force",
      graft.operators.Similarity.bruteForceTopK(emb, 5, 50), 5)
    assertPartialBelowExchange("brute_force_native",
      graft.operators.Similarity.bruteForceTopKNative(emb, 5, 50), 5)
    assertPartialBelowExchange("pq_sweep",
      graft.operators.Pq.qPqTopK(spark, sf), 5 * graft.operators.Pq.Refine)
    assertPartialBelowExchange("rp_coarse",
      graft.operators.Rp.qRpTopK(spark, sf), 20)
  }

  test("top-k shuffle volume scales with the answer, not the corpus") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val nQ = 50L
    val candidates = nQ * (n - 1) // rows scored by the exhaustive sweep
    val written = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          written.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.operators.Similarity.bruteForceTopKNative(emb, 5, nQ.toInt)
        .write.format("noop").mode("overwrite").save()
      // listener events are async; wait for the counter to go quiet
      var prev = -1L
      var spins = 0
      while (written.get() != prev && spins < 50) {
        prev = written.get(); spins += 1; Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val total = written.get()
    assert(total > 0L, "no shuffle observed — measurement vacuous")
    // answer-bound: |Q|·k rows per input partition reach the group-limit
    // exchange, plus the final window's own (already k-bounded) rows.
    // 4x slack covers both plus scheduler-partition variance; the
    // un-limited exchange would be `candidates` rows — orders beyond it.
    val parallelism = spark.sparkContext.defaultParallelism
    val answerBound = 4L * nQ * 5 * parallelism
    assert(total <= answerBound,
      s"shuffle carried $total records — exceeds the answer bound " +
        s"$answerBound (candidates = $candidates): the partial group " +
        "limit is not bounding the exchange")
    assert(total < candidates / 4,
      s"shuffle records $total not clearly below candidate count $candidates")
  }
}
