package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Schedule-loop parity with the reference's Airflow DAG settings
  * (/root/reference/airflow/dags/weather_pipeline_dag.py:26-35):
  *
  *  - `schedule_interval='0 * * * *'` → runs fire at epoch-aligned
  *    interval boundaries (top of the hour for the default), not
  *    "interval after the previous run finished";
  *  - `max_active_runs=1` → a run gate shared with external triggers:
  *    anything arriving while a run is active is SKIPPED, never queued
  *    or overlapped;
  *  - `catchup=False` → boundaries missed while a long run was active
  *    are dropped, and the loop re-aligns to the next FUTURE boundary;
  *  - per-stage `execution_timeout`/`retries` stay where they already
  *    live: inside [[Pipeline.run]] via [[StageRunner.RetryPolicy]]
  *    (2 h / 3 retries defaults), so a hung stage times out and retries
  *    within its run while the scheduler keeps the cadence;
  *  - a FAILED run doesn't kill the scheduler (Airflow marks the DAG
  *    run failed and schedules the next one) — the error is recorded
  *    and the loop continues.
  *
  * `clock`/`sleeper` are injectable so specs drive hours of schedule in
  * microseconds (same discipline as StageRunner's `sleeper`).
  */
final class Scheduler(
    intervalMs: Long = 60L * 60 * 1000,
    clock: () => Long = System.currentTimeMillis,
    sleeper: Long => Unit = Thread.sleep,
    onSkip: Long => Unit = _ => ()) {
  require(intervalMs > 0, "interval must be positive")

  import Scheduler._

  private val active = new AtomicBoolean(false)

  /** Next epoch-aligned boundary strictly after `now`. */
  def nextBoundary(now: Long): Long = (now / intervalMs + 1) * intervalMs

  /** The max_active_runs=1 gate. Runs `body` unless a run is already
    * active, in which case the trigger is skipped (None) and `onSkip`
    * fires. Shared by the schedule loop and any external trigger, so
    * a manual run can't overlap a scheduled one either. Failures are
    * captured, not thrown — scheduling survives a failed run. */
  def runGated[T](body: => T): Option[Either[Throwable, T]] =
    if (!active.compareAndSet(false, true)) { onSkip(clock()); None }
    else {
      try Some(Right(body))
      catch { case e: Throwable => Some(Left(e)) }
      finally active.set(false)
    }

  /** Run `body` at every aligned boundary, `maxTicks` times (the test /
    * bounded-operations entry; a service caller passes Int.MaxValue).
    * Returns one [[Tick]] per fired boundary; boundaries that passed
    * while a run was active appear as skipped ticks (catchup=False).
    * `onTick` fires as each tick resolves — an unbounded service logs
    * through it, since the returned Seq only materializes on exit. */
  def loop[T](maxTicks: Int, onTick: Tick[T] => Unit = (_: Tick[T]) => ())
      (body: => T): Seq[Tick[T]] = {
    val out = Vector.newBuilder[Tick[T]]
    var fired = 0
    def emit(t: Tick[T]): Unit = { out += t; onTick(t) }
    while (fired < maxTicks) {
      val now = clock()
      val boundary = nextBoundary(now)
      sleeper(boundary - now)
      fired += 1
      emit(Tick(boundary, runGated(body)))
      // boundaries that elapsed DURING the run are dropped, not caught
      // up — surface them as explicit skipped ticks for observability
      val after = clock()
      var missed = boundary + intervalMs
      while (missed <= after && fired < maxTicks) {
        onSkip(missed)
        emit(Tick(missed, None))
        fired += 1
        missed += intervalMs
      }
    }
    out.result()
  }
}

object Scheduler {

  /** One fired boundary: `outcome` is None when the tick was skipped
    * (run already active, or boundary missed under catchup=False),
    * Left(error) for a failed run, Right(result) for a completed one. */
  final case class Tick[T](scheduledFor: Long, outcome: Option[Either[Throwable, T]])

  /** Hourly pipeline service loop — the DAG replacement a reference
    * user runs: `Scheduler.schedule(spark, cfg)` is
    * `weather_pipeline` with its stock settings. */
  def schedule(spark: SparkSession, cfg: Pipeline.Config,
      intervalMs: Long = 60L * 60 * 1000,
      maxTicks: Int = Int.MaxValue,
      onTick: Tick[Pipeline.Report] => Unit = _ => ()): Seq[Tick[Pipeline.Report]] =
    new Scheduler(intervalMs).loop(maxTicks, onTick)(Pipeline.run(spark, cfg))
}
