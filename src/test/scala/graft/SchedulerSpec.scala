package graft

import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite

/** Airflow schedule parity (weather_pipeline_dag.py:26-35): epoch-aligned
  * boundaries, max_active_runs=1 overlap skip, catchup=False coalescing,
  * failed runs not killing the loop. Injected clock/sleeper — hours of
  * schedule in microseconds, pure JVM-side. */
class SchedulerSpec extends AnyFunSuite {

  /** Fake time: sleeper advances the clock; bodies advance it to model
    * run duration. */
  private class FakeTime(var now: Long) {
    def clock: () => Long = () => now
    def sleeper: Long => Unit = ms => now += ms
  }

  test("runs fire at aligned boundaries; a failed run doesn't kill the loop") {
    val t = new FakeTime(12345)
    val sched = new Scheduler(intervalMs = 1000, clock = t.clock, sleeper = t.sleeper)
    val startedAt = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val ticks = sched.loop(3) {
      startedAt += t.now
      calls += 1
      if (calls == 2) sys.error("gold store down")
      calls
    }
    assert(ticks.map(_.scheduledFor) == Seq(13000L, 14000L, 15000L),
      "hourly-analog ticks align to interval boundaries, not run ends")
    assert(startedAt.toSeq == Seq(13000L, 14000L, 15000L))
    assert(ticks(0).outcome.contains(Right(1)))
    assert(ticks(1).outcome.exists(_.isLeft), "failure recorded, loop continued")
    assert(ticks(2).outcome.contains(Right(3)))
  }

  test("catchup=False: boundaries missed during a long run are skipped, not queued") {
    val t = new FakeTime(500)
    val skipped = scala.collection.mutable.ArrayBuffer[Long]()
    val sched = new Scheduler(intervalMs = 1000, clock = t.clock,
      sleeper = t.sleeper, onSkip = skipped += _)
    val ran = scala.collection.mutable.ArrayBuffer[Long]()
    val ticks = sched.loop(4) {
      ran += t.now
      t.now += 2500 // a 2.5-interval run: overruns boundaries at +1 and +2
    }
    assert(ticks.map(_.scheduledFor) == Seq(1000L, 2000L, 3000L, 4000L))
    assert(ticks.map(_.outcome.isDefined) == Seq(true, false, false, true),
      "the two boundaries that elapsed mid-run surface as skipped ticks")
    assert(skipped.toSeq == Seq(2000L, 3000L), "skips are observable")
    assert(ran.toSeq == Seq(1000L, 4000L),
      "next run re-aligns to the next FUTURE boundary — no burst catch-up")
  }

  test("max_active_runs=1: a trigger during an active run is skipped") {
    val skipped = new java.util.concurrent.atomic.AtomicInteger(0)
    val sched = new Scheduler(intervalMs = 1000, onSkip = _ => skipped.incrementAndGet())
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val first = new Thread(() => {
      sched.runGated { inBody.countDown(); release.await(); "long run" }
      ()
    })
    first.start()
    inBody.await()
    // second trigger while the first is active: skipped, not queued
    assert(sched.runGated("manual trigger").isEmpty)
    assert(skipped.get() == 1)
    release.countDown()
    first.join()
    // gate released → the next trigger runs
    assert(sched.runGated("after").contains(Right("after")))
    assert(skipped.get() == 1)
  }

  test("boundary alignment is strict: a tick exactly ON a boundary fires the next one") {
    val sched = new Scheduler(intervalMs = 1000, clock = () => 5000L, sleeper = _ => ())
    assert(sched.nextBoundary(5000L) == 6000L, "strictly-after semantics")
    assert(sched.nextBoundary(5999L) == 6000L)
  }

  test("Service arg parsing: DAG-stock defaults, overrides, loud failures") {
    val sc = Service.parse(Seq("--source", "/landing", "--warehouse", "/wh"))
    assert(sc.pipeline.sourceDir == "/landing" && sc.pipeline.warehouseDir == "/wh")
    assert(sc.pipeline.jdbcUrl.isEmpty)
    assert(sc.intervalMs == 60L * 60 * 1000 && sc.maxTicks == Int.MaxValue)
    // stock DAG retry posture rides along (retries=3, 5min delay, 2h timeout)
    assert(sc.pipeline.retry ==
      StageRunner.RetryPolicy(3, 5 * 60 * 1000L, 2L * 60 * 60 * 1000))

    val sc2 = Service.parse(Seq("--source", "s", "--warehouse", "w",
      "--jdbc-url", "jdbc:derby:x", "--interval-minutes", "15",
      "--max-ticks", "4", "--max-null-ratio", "0.25",
      "--retries", "1", "--retry-delay-minutes", "1"))
    assert(sc2.pipeline.jdbcUrl.contains("jdbc:derby:x"))
    assert(sc2.intervalMs == 15L * 60 * 1000 && sc2.maxTicks == 4)
    assert(sc2.pipeline.maxNullRatio == 0.25)
    assert(sc2.pipeline.retry.retries == 1 &&
      sc2.pipeline.retry.retryDelayMs == 60 * 1000L)

    intercept[IllegalArgumentException](Service.parse(Seq("--warehouse", "w")))
    intercept[IllegalArgumentException](Service.parse(Seq(
      "--source", "s", "--warehouse", "w", "--retention-days", "30")))
    intercept[IllegalArgumentException](Service.parse(Seq(
      "--source", "s", "--warehouse", "w", "--interval-minutes", "0")))
    intercept[IllegalArgumentException](Service.parse(Seq(
      "--source", "s", "--warehouse")))
  }

}
