package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Checksum-validated card scrub: only Luhn-valid 16-digit runs may
  * rewrite — the false-positive guard a bare regex scrub lacks. */
class LuhnSpec extends SparkSpecBase {
  import spark.implicits._

  private def luhnRef(s: String): Boolean =
    s.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum % 10 == 0

  private def scrub(texts: Seq[String]) = {
    val (nc, nv, clean) = Curation.luhnScrub(col("t"))
    texts.toDF("t").select(nc.as("nc"), nv.as("nv"), clean.as("c")).collect()
  }

  test("classic test card validates; off-by-one check digit does not") {
    assert(luhnRef("4111111111111111"), "reference impl sanity")
    assert(!luhnRef("4111111111111112"))
    val r = scrub(Seq("pay 4111111111111111 not 4111111111111112 ok"))
    assert(r.head.getLong(0) == 2 && r.head.getLong(1) == 1)
    assert(r.head.getString(2) == "pay <CARD> not 4111111111111112 ok")
  }

  test("column validator agrees with the plain-Scala reference on random digits") {
    val rng = new scala.util.Random(42)
    val cands = (1 to 200).map(_ =>
      (1 to 16).map(_ => rng.nextInt(10)).mkString)
    val rows = scrub(cands.map(c => s"x $c y"))
    rows.zip(cands).foreach { case (r, c) =>
      val expected = if (luhnRef(c)) 1L else 0L
      assert(r.getLong(1) == expected, s"$c: got ${r.getLong(1)}")
      assert((r.getString(2) == s"x <CARD> y") == (expected == 1L), c)
    }
  }

  test("several valid cards in one doc all scrub in one pass") {
    val r = scrub(Seq("a 4111111111111111 b 4532015112830366 c"))
    // second constant is Luhn-valid iff the reference says so — derive
    val both = Seq("4111111111111111", "4532015112830366").count(luhnRef)
    assert(r.head.getLong(1) == both)
    if (both == 2) assert(r.head.getString(2) == "a <CARD> b <CARD> c")
  }

  test("no 16-digit run → no candidates, text unchanged") {
    val r = scrub(Seq("only 123456789012345 (15) and 12345678901234567 (17)"))
    assert(r.head.getLong(0) == 0 && r.head.getLong(1) == 0)
    assert(r.head.getString(2).contains("123456789012345 (15)"))
  }

  test("fixture: every doc has exactly 2 candidates, 1 valid, and scrubs the valid one") {
    val out = Curation.qPiiLuhn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 2 && r.getLong(2) == 1, r.toString)
      assert(r.getString(3).contains("<CARD>"), "valid card not scrubbed")
      assert(r.getString(3).contains(" ref 4"), "invalid card must survive")
    }
  }
}
