package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Entity
import graft.plans.JaroWinklerKernel

/** Jaro–Winkler kernel: bit-identical to DuckDB's
  * jaro_winkler_similarity (the oracle), and the blocked+length-bounded
  * operator must reproduce the per-block brute force exactly. */
class JaroWinklerSpec extends SparkSpecBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel is bit-identical to DuckDB on pinned fixtures") {
    // right-hand literals are DuckDB 1.x jaro_winkler_similarity outputs
    // (shortest-roundtrip repr = exact double)
    val pinned = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      // jaro lands on 0.70000000000000007 — the boost-threshold edge
      ("abcqq", "abcxxx", 0.79),
      // above threshold but zero common prefix: no boost applies
      ("CRATE", "TRACE", 0.7333333333333334),
      ("a", "ab", 0.8500000000000001),
      // below threshold WITH a common prefix: boost must NOT apply
      ("abcdef", "abzzzz", 0.5555555555555555),
      ("small ring", "small table", 0.8290909090909091),
      ("sky blue table", "sky blue chair", 0.8857142857142858))
    pinned.foreach { case (a, b, want) =>
      assert(jw(a, b) == want, s"jw($a, $b)")
      assert(jw(b, a) == want, s"jw($b, $a) — symmetry")
    }
  }

  test("kernel edges: equal, empty, disjoint, adjacent transposition") {
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("hello", "") == 0.0)
    assert(jw("", "hello") == 0.0)
    assert(jw("xyz", "qrs") == 0.0)
    // window ⌊2/2⌋−1 = 0 leaves "ab"/"ba" matchless — the standard rule
    assert(jw("ab", "ba") == 0.0)
  }

  test("length bound never drops a qualifying pair (fixture brute force)") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val brute = (for {
      a <- parts; b <- parts
      if a._3 == b._3 && a._1 < b._1
      m = math.floor(jw(a._2, b._2) * 1000000d).toLong
      if m >= Entity.JwThresholdMicro
    } yield (a._1, b._1, m)).toSet
    val got = Entity.qPartJaroWinkler(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture should contain at least one name variant")
  }

  test("histogram candidate bound is an implication on every fixture pair") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    import graft.plans.JaroWinklerKernel.{hist, histCandidate}
    val names = Tables.part(spark, sf).select(col("p_name"))
      .collect().map(_.getString(0)).distinct
    val hs = names.map(n => n -> hist(u8(n))).toMap
    var qualifying = 0
    for (a <- names; b <- names if a < b) {
      val m = math.floor(jw(a, b) * 1000000d).toLong
      if (m >= Entity.JwThresholdMicro) {
        qualifying += 1
        assert(histCandidate(hs(a), hs(b), Entity.JwThresholdMicro),
          s"bound dropped a qualifying pair: '$a' / '$b' ($m)")
      }
    }
    assert(qualifying > 0)
    // the corners the kernel short-circuits
    assert(histCandidate(hist(u8("")), hist(u8("")), 900000L))
    assert(!histCandidate(hist(u8("abc")), hist(u8("")), 900000L))
    assert(!histCandidate(hist(u8("abcdef")), hist(u8("xyzuvw")), 900000L))
  }

  test("non-BMP names: length bound runs on kernel units, not codepoints") {
    // "𝕏" is a surrogate pair: 10 codepoints = 20 UTF-16 units. The old
    // Spark-side length() conjunct compared CODEPOINT counts (10 vs 22
    // < 1/2 → dropped) while the kernel scores 0.925 ≥ 0.9 on units —
    // the bound now lives in jwHistCandidate on the hist headers' unit
    // lengths, so the qualifying pair must survive
    val x = "𝕏" * 10
    val a = x
    val b = x + "abcdefghijkl"
    val kernelScore = jw(a, b)
    assert(kernelScore >= 0.9, s"fixture assumption broke: $kernelScore")
    val df = Seq((1L, a), (2L, b)).toDF("id", "nm")
      .withColumn("blk", lit("B"))
    val got = Entity.jaroWinklerPairs(df, "id", "nm", "blk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"non-BMP qualifying pair dropped: $got")
  }

  test("SQL surface: jaro_winkler registered via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").collect().head.getDouble(0)
    assert(got == 0.9611111111111111)
  }

  test("prefilter implication holds at the bound: 5θ−4 length ratio") {
    // lmin/lmax just below 1/2 at θ=0.9 can NEVER reach 0.9:
    // jw ≤ 0.6·jaro + 0.4 and jaro ≤ (2 + lmin/lmax)/3
    val a = "abcd"
    val b = "abcdefghi" // 4 vs 9: ratio < 1/2
    val bound = 0.6 * ((2.0 + 4.0 / 9.0) / 3.0) + 0.4
    assert(bound < 0.9)
    assert(jw(a, b) <= bound)
  }

  test("gated fixture column is pure ASCII (the documented parity assumption)") {
    // the kernel scores UTF-16 code units while DuckDB's
    // jaro_winkler_similarity scores UTF-8 bytes, so the
    // entity_jarowinkler oracle gate only holds while the fixture's
    // p_name stays ASCII (ADVICE r14) — machine-check it on every
    // fixture tier the gate can run against, so a testdata regen that
    // introduces non-ASCII names fails HERE with a diagnosis instead of
    // as an inscrutable hash mismatch
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
         if java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) {
      val nonAscii = Tables.part(spark, dir)
        .filter(col("p_name").rlike("[^\\x00-\\x7F]")).count()
      assert(nonAscii == 0L,
        s"$dir p_name has $nonAscii non-ASCII rows — the DuckDB parity " +
          "assumption no longer holds; the kernel needs a UTF-8-unit twin")
    }
  }
}
