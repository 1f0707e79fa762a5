package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Session-wide query metrics ledger via `QueryExecutionListener` — the
  * observability plane a production deployment points at its metrics
  * store: every completed action records (name, duration, rows read per
  * source, output rows when cheap, shuffle presence) WITHOUT touching
  * any query code; failures record the error class instead of
  * vanishing. Complements the per-run `observe()` counters inside
  * Pipeline (those are per-job business metrics; this is the
  * engine-level audit log).
  *
  * The listener runs on the driver's listener bus — collection is
  * control-plane metadata only (metrics already aggregated by the
  * executors), never data. Bounded: the in-memory ledger keeps the most
  * recent [[MaxEntries]] records (a service exports and truncates). */
object Metrics {

  val MaxEntries = 10000

  final case class QueryRecord(
      name: String, durationNs: Long, outputRows: Option[Long],
      scannedFiles: Long, scanRows: Long, hasShuffle: Boolean,
      error: Option[String])

  final class Ledger extends QueryExecutionListener {
    private val entries = new ConcurrentLinkedQueue[QueryRecord]()
    // ConcurrentLinkedQueue.size is O(n); a saturated ledger would walk
    // MaxEntries nodes per completed query on the listener bus (ADVICE
    // r9) — track the count in an AtomicInteger instead
    private val nEntries = new java.util.concurrent.atomic.AtomicInteger(0)

    /** Walk INCLUDING adaptive wrappers: AQE hides the materialized tree
      * behind AdaptiveSparkPlanExec/QueryStageExec, which `foreach` does
      * not descend into. */
    private def walk(p: org.apache.spark.sql.execution.SparkPlan)(
        f: org.apache.spark.sql.execution.SparkPlan => Unit): Unit = {
      f(p)
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case other => other.children
      }
      kids.foreach(walk(_)(f))
    }

    private def scanStats(qe: QueryExecution): (Long, Long, Boolean) = {
      var files = 0L; var rows = 0L; var shuffle = false
      walk(qe.executedPlan) { p =>
        val n = p.nodeName.toLowerCase
        if (n.contains("scan")) {
          p.metrics.get("numFiles").foreach(files += _.value)
          p.metrics.get("numOutputRows").foreach(rows += _.value)
        }
        if (n.contains("exchange") || n.contains("shufflequerystage"))
          shuffle = true
      }
      (files, rows, shuffle)
    }

    private def record(r: QueryRecord): Unit = {
      entries.add(r)
      var n = nEntries.incrementAndGet()
      while (n > MaxEntries) {
        if (entries.poll() != null) n = nEntries.decrementAndGet()
        else {
          // lost an eviction race: another thread drained the entry we
          // were about to poll. Exiting with the counter untouched would
          // leave nEntries permanently above the true queue size and
          // shrink effective capacity for the session's remainder
          // (ADVICE r10) — reconcile to the observed size instead (the
          // O(n) size() walk runs only on this rare race path).
          nEntries.compareAndSet(n, entries.size())
          n = 0
        }
      }
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val (files, rows, shuffle) = scanStats(qe)
      val out = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
      record(QueryRecord(funcName, durationNs, out, files, rows, shuffle, None))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      record(QueryRecord(funcName, 0L, None, 0L, 0L, hasShuffle = false,
        Some(exception.getClass.getSimpleName)))

    def snapshot(): Seq[QueryRecord] = {
      val it = entries.iterator()
      val b = Seq.newBuilder[QueryRecord]
      while (it.hasNext) b += it.next()
      b.result()
    }

    def clear(): Unit = { entries.clear(); nEntries.set(0) }
  }

  /** Attach a fresh ledger to the session and return it. */
  def attach(spark: SparkSession): Ledger = {
    val l = new Ledger
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: Ledger): Unit =
    spark.listenerManager.unregister(l)
}
