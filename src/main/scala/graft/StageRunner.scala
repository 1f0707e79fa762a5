package graft

import java.util.concurrent.{Callable, ExecutionException, Executors, TimeUnit, TimeoutException}

import graft.sinks.JdbcSink

/** Airflow-grade operational semantics for pipeline stages
  * (weather_pipeline_dag.py:15-23): bounded retries with delay, a
  * per-stage execution timeout, ledger rows per attempt, and
  * notification hooks (email_on_failure=True / email_on_retry=False →
  * failure + success hooks are the default-on ones; the retry hook
  * exists for parity with retry-email turned on).
  */
object StageRunner {

  /** retries=3, retry_delay=5min, execution_timeout=2h
    * (weather_pipeline_dag.py:20-23). `retries` counts EXTRA attempts
    * after the first, exactly like Airflow's default_args. */
  final case class RetryPolicy(
      retries: Int = 3,
      retryDelayMs: Long = 5 * 60 * 1000L,
      executionTimeoutMs: Long = 2 * 60 * 60 * 1000L)

  /** Notification surface (send_success_notification /
    * send_failure_notification tasks, weather_pipeline_dag.py:226-260).
    * Default no-op so library callers opt in. */
  trait Notifier {
    def onRetry(stage: String, attempt: Int, error: Throwable): Unit = ()
    def onStageFailure(stage: String, attempts: Int, error: Throwable): Unit = ()
    def onSuccess(report: Pipeline.Report): Unit = ()
  }
  object Notifier { val noop: Notifier = new Notifier {} }

  final class StageTimeoutException(stage: String, ms: Long)
    extends RuntimeException(s"stage $stage exceeded execution timeout ${ms}ms")

  /** Run `f` with a hard wall-clock bound (Airflow's execution_timeout
    * kills the task; here the worker thread is interrupted — Spark jobs
    * observe the interrupt at the next task boundary). */
  def withTimeout[T](stage: String, ms: Long)(f: => T): T =
    if (ms <= 0) f
    else {
      val ex = Executors.newSingleThreadExecutor { r =>
        val t = new Thread(r, s"stage-$stage"); t.setDaemon(true); t
      }
      try {
        val fut = ex.submit(new Callable[T] { def call(): T = f })
        try fut.get(ms, TimeUnit.MILLISECONDS)
        catch {
          case _: TimeoutException =>
            fut.cancel(true); throw new StageTimeoutException(stage, ms)
          case e: ExecutionException => throw e.getCause
        }
      } finally ex.shutdownNow()
    }
}

/** Executes named stages under a [[StageRunner.RetryPolicy]], writing one
  * ledger row PER ATTEMPT (the reference's Airflow UI shows each try;
  * pipeline_execution_log rows are our equivalent record). */
final class StageRunner(
    executionId: String,
    log: Option[JdbcSink.PipelineLog],
    policy: StageRunner.RetryPolicy = StageRunner.RetryPolicy(),
    notifier: StageRunner.Notifier = StageRunner.Notifier.noop,
    sleeper: Long => Unit = Thread.sleep) {
  import StageRunner._

  def staged[T](stage: String, rows: T => Long)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      attempt += 1
      val started = log.map(_.logStart(executionId, stage, attempt))
      try {
        val r = withTimeout(stage, policy.executionTimeoutMs)(f)
        log.foreach(_.logEnd(executionId, stage, started.get, "SUCCESS",
          rows(r), attempt = attempt))
        out = Some(r)
      } catch {
        case e: Throwable =>
          log.foreach(_.logEnd(executionId, stage, started.get, "FAILURE", -1,
            s"""{"error":"${e.getClass.getSimpleName}","attempt":$attempt}""",
            attempt))
          if (attempt <= policy.retries) {
            notifier.onRetry(stage, attempt, e)
            sleeper(policy.retryDelayMs)
          } else {
            notifier.onStageFailure(stage, attempt, e)
            throw e
          }
      }
    }
    out.get
  }
}
