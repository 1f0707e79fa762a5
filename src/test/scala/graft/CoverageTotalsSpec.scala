package graft

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r13 item 1: COVERAGE.md's totals header went stale two
  * rounds running because it was hand-edited. The block is now
  * GENERATED (tools/coverage_totals.py) and this spec fails the build
  * whenever it diverges from the live contract — the numbers are
  * re-derived here, independently, from `SparkEntry.queries` itself
  * and the spec sources, so a hand edit, a forgotten regeneration, or
  * a drift in the tool's parsing all fail `sbt test`. */
class CoverageTotalsSpec extends AnyFunSuite {

  private val root: Path = {
    // sbt runs suites with user.dir = project base; be tolerant of a
    // nested fork by walking up to the dir holding COVERAGE.md
    var p = Paths.get(System.getProperty("user.dir")).toAbsolutePath
    while (p != null && !Files.exists(p.resolve("COVERAGE.md")))
      p = p.getParent
    require(p != null, "COVERAGE.md not found above user.dir")
    p
  }

  private def read(p: Path): String =
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)

  private val block: String = {
    val cov = read(root.resolve("COVERAGE.md"))
    val m = "(?s)<!-- totals:begin.*?totals:end -->".r.findFirstIn(cov)
    assert(m.isDefined, "COVERAGE.md lacks the generated totals block")
    m.get
  }

  private def num(pattern: String): Int = {
    val m = pattern.r.findFirstMatchIn(block)
    assert(m.isDefined, s"totals block lacks '$pattern':\n$block")
    m.get.group(1).toInt
  }

  test("query total equals the live SparkEntry.queries size") {
    assert(num("""\*\*(\d+) queries declared""") == SparkEntry.queries.size,
      "COVERAGE.md totals stale — run python3 tools/coverage_totals.py")
  }

  test("static-twin total equals the declared oracleSql literals") {
    // same derivation as the tool: literal `"name" ->` keys in the
    // oracleSql section (trained-model twins are appended at verify
    // time and counted as the queries−static remainder)
    val entry = read(root.resolve(
      "src/main/scala/graft/SparkEntry.scala"))
    val osec = entry.split("def oracleSql", 2)(1)
    val qsec = entry.split("def queries", 2)(1).split("def oracleSql", 2)(0)
    val key = """"([A-Za-z0-9_]+)"\s*->""".r
    val statics = key.findAllMatchIn(osec).map(_.group(1)).toSet
    val qkeys = key.findAllMatchIn(qsec).map(_.group(1)).toSet
    // the regex derivation itself is validated against the live map
    assert(qkeys.size == SparkEntry.queries.size,
      "query-key regex drifted from the live queries map")
    assert(statics.subsetOf(qkeys), s"oracle-only keys: ${statics -- qkeys}")
    assert(num("""\((\d+) static DuckDB""") == statics.size,
      "COVERAGE.md totals stale — run python3 tools/coverage_totals.py")
  }

  test("spec and suite totals equal the test-source tree") {
    val dir = root.resolve("src/test/scala/graft")
    val s = Files.list(dir)
    val suites =
      try s.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith("Spec.scala")).toSeq
      finally s.close()
    val tests = suites.map(f => """test\("""".r.findAllIn(read(f)).size).sum
    assert(num("""\*\*(\d+) specs across""") == tests,
      "COVERAGE.md totals stale — run python3 tools/coverage_totals.py")
    assert(num("""across (\d+)\s+suites""") == suites.size,
      "COVERAGE.md totals stale — run python3 tools/coverage_totals.py")
  }
}
