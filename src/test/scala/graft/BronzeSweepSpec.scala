package graft

import java.nio.file.{Files, Path}

import graft.sources.Bronze

/** Retention-sweep boundary coverage: the sweep deletes whole partition
  * directories, so an off-by-one would silently destroy unexpired data.
  * Builds real year=/month=/day= trees in a temp dir and pins the cutoff
  * semantics (newest-covered-day decides; strict isBefore keeps the exact
  * cutoff day) plus malformed-directory tolerance. */
class BronzeSweepSpec extends SparkSpecBase {

  private def mk(root: Path, rel: String): Path = {
    val p = root.resolve(rel)
    Files.createDirectories(p)
    Files.write(p.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    p
  }

  private def exists(root: Path, rel: String): Boolean =
    Files.exists(root.resolve(rel))

  private def tree(): Path = Files.createTempDirectory("sweep")

  test("expired day partitions drop; the exact cutoff day is retained") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    // keepDays=10 → cutoff 2024-03-05; dirs strictly older than cutoff go
    mk(root, "year=2024/month=3/day=4")  // 2024-03-04 < cutoff → delete
    mk(root, "year=2024/month=3/day=5")  // == cutoff → KEEP (strict isBefore)
    mk(root, "year=2024/month=3/day=6")  // newer → keep
    val removed = Bronze.retentionSweep(spark, root.toString, 10, today)
    assert(removed == 1)
    assert(!exists(root, "year=2024/month=3/day=4"))
    assert(exists(root, "year=2024/month=3/day=5"))
    assert(exists(root, "year=2024/month=3/day=6"))
  }

  test("partially-expired month survives at month level; whole-old month drops") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    // Feb's last covered day (02-29) < cutoff 03-05 → whole month dir drops
    mk(root, "year=2024/month=2/day=28")
    mk(root, "year=2024/month=2/day=29")
    // March covers up to 03-31 ≥ cutoff → month survives, only old days drop
    mk(root, "year=2024/month=3/day=1")
    mk(root, "year=2024/month=3/day=10")
    val removed = Bronze.retentionSweep(spark, root.toString, 10, today)
    assert(removed == 2, "one month dir + one day dir")
    assert(!exists(root, "year=2024/month=2"))
    assert(exists(root, "year=2024/month=3"))
    assert(!exists(root, "year=2024/month=3/day=1"))
    assert(exists(root, "year=2024/month=3/day=10"))
  }

  test("year-level pruning keeps a year whose tail is inside retention") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 1, 5)
    mk(root, "year=2022/month=12/day=31") // year covers ≤2022-12-31 < cutoff → drop at year level
    mk(root, "year=2023/month=12/day=31") // 2023 covers up to 12-31 ≥ cutoff 2023-12-26 → keep
    val removed = Bronze.retentionSweep(spark, root.toString, 10, today)
    assert(removed == 1)
    assert(!exists(root, "year=2022"))
    assert(exists(root, "year=2023/month=12/day=31"))
  }

  test("malformed partition values are skipped, never deleted, never fatal") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    mk(root, "year=2024/month=0/day=3")   // month=0 → no real date
    mk(root, "year=2024/month=13/day=3")  // month=13
    mk(root, "year=2024/month=3/day=32")  // day out of range (month survives: covers ≤03-31)
    mk(root, "year=2024/month=3/day=")    // empty value
    mk(root, "year=2024/month=1/day=1")   // genuinely expired month, must still drop
    val removed = Bronze.retentionSweep(spark, root.toString, 10, today)
    assert(removed == 1, "only the valid expired month (Jan covers ≤01-31 < cutoff)")
    assert(exists(root, "year=2024/month=0/day=3"))
    assert(exists(root, "year=2024/month=13/day=3"))
    assert(exists(root, "year=2024/month=3/day=32"))
    assert(exists(root, "year=2024/month=3/day="))
    assert(!exists(root, "year=2024/month=1"))
  }

  test("non-date partition levels recurse transparently") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    mk(root, "source=api/year=2024/month=1/day=1") // expired under a non-date level
    mk(root, "source=api/year=2024/month=3/day=14")
    val removed = Bronze.retentionSweep(spark, root.toString, 10, today)
    assert(removed == 1, "month=1 dir drops; source= level itself untouched")
    assert(exists(root, "source=api/year=2024/month=3/day=14"))
    assert(!exists(root, "source=api/year=2024/month=1"))
  }

  test("missing root is a zero-op") {
    assert(Bronze.retentionSweep(spark, "/tmp/does-not-exist-sweep", 10) == 0)
  }

  test("sweep prunes swept entries from a streaming-sink manifest, keeps the rest") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    val old = mk(root, "year=2024/month=1/day=1")
    val live = mk(root, "year=2024/month=3/day=14")
    val logDir = root.resolve("_spark_metadata")
    Files.createDirectories(logDir)
    def entry(p: Path) =
      s"""{"path":"file://$p/part-0.parquet","size":3,"isDir":false,"action":"add"}"""
    Files.write(logDir.resolve("0"),
      s"v1\n${entry(old)}\n${entry(live)}\n".getBytes("UTF-8"))
    assert(Bronze.retentionSweep(spark, root.toString, 10, today) == 1)
    val lines = new String(Files.readAllBytes(logDir.resolve("0")), "UTF-8")
      .linesIterator.toList
    assert(lines.head == "v1", "header survives the rewrite")
    assert(lines.size == 2, s"one live entry kept: $lines")
    assert(lines(1).contains("month=3"), lines(1))
  }

  test("manifest rewrite recovers a log file orphaned by a mid-swap crash") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    val old = mk(root, "year=2024/month=1/day=1")
    val live = mk(root, "year=2024/month=3/day=14")
    val logDir = root.resolve("_spark_metadata")
    Files.createDirectories(logDir)
    def entry(p: Path) =
      s"""{"path":"file://$p/part-0.parquet","size":3,"isDir":false,"action":"add"}"""
    // Simulate a crash between rename(orig→bak) and rename(tmp→orig): the
    // batch-0 log exists ONLY as its .bak, plus an incomplete .tmp.
    Files.write(logDir.resolve(".0.retention.bak"),
      s"v1\n${entry(old)}\n${entry(live)}\n".getBytes("UTF-8"))
    Files.write(logDir.resolve(".0.retention.tmp"), "v1\n".getBytes("UTF-8"))
    assert(Bronze.retentionSweep(spark, root.toString, 10, today) == 1)
    val lines = new String(Files.readAllBytes(logDir.resolve("0")), "UTF-8")
      .linesIterator.toList
    assert(lines.head == "v1" && lines.size == 2, s"restored then pruned: $lines")
    assert(lines(1).contains("month=3"), lines(1))
    assert(!Files.exists(logDir.resolve(".0.retention.bak")))
    assert(!Files.exists(logDir.resolve(".0.retention.tmp")))
  }

  test("interrupted swap re-prunes restored entries whose files a past sweep deleted") {
    // Crash replay: run 1 deleted year=2024/month=1, wrote the pruned
    // .tmp, renamed the log to .bak, then died. Run 2 starts with the
    // month gone (so prefix-matching can never catch it again), restores
    // the .bak — whose content still references the deleted files — and
    // must fall back to existence-based pruning for that file.
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    val live = mk(root, "year=2024/month=3/day=14")
    val deadDir = root.resolve("year=2024/month=1/day=1") // never created: already swept
    val logDir = root.resolve("_spark_metadata")
    Files.createDirectories(logDir)
    def entry(p: Path) =
      s"""{"path":"file://$p/part-0.parquet","size":3,"isDir":false,"action":"add"}"""
    Files.write(logDir.resolve(".0.retention.bak"),
      s"v1\n${entry(deadDir)}\n${entry(live)}\n".getBytes("UTF-8"))
    Files.write(logDir.resolve(".0.retention.tmp"),
      s"v1\n${entry(live)}\n".getBytes("UTF-8"))
    // nothing expires this run — bronzeDays window covers everything
    assert(Bronze.retentionSweep(spark, root.toString, 3650, today) == 0)
    val lines = new String(Files.readAllBytes(logDir.resolve("0")), "UTF-8")
      .linesIterator.toList
    assert(lines.head == "v1" && lines.size == 2, s"stale entry must drop: $lines")
    assert(lines(1).contains("month=3"), lines(1))
  }

  test("stale .bak beside a surviving original is dropped, original untouched") {
    val root = tree()
    val today = java.time.LocalDate.of(2024, 3, 15)
    val live = mk(root, "year=2024/month=3/day=14")
    val logDir = root.resolve("_spark_metadata")
    Files.createDirectories(logDir)
    val body =
      s"""v1\n{"path":"file://$live/part-0.parquet","size":3,"isDir":false,"action":"add"}\n"""
    Files.write(logDir.resolve("0"), body.getBytes("UTF-8"))
    // crash-after-swap residue: new file already in place, .bak left behind
    Files.write(logDir.resolve(".0.retention.bak"), "v1\nGARBAGE\n".getBytes("UTF-8"))
    assert(Bronze.retentionSweep(spark, root.toString, 10, today) == 0)
    assert(new String(Files.readAllBytes(logDir.resolve("0")), "UTF-8") == body)
    assert(!Files.exists(logDir.resolve(".0.retention.bak")))
  }
}
