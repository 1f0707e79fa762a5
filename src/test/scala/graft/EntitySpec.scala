package graft

import org.apache.spark.sql.functions._

import graft.operators.Entity

/** Deletion-neighborhood blocking completeness vs brute force on planted
  * substitution / insertion / deletion cases; the corpus gate is the
  * DuckDB n² oracle (`entity_edit_pairs`). */
class EntitySpec extends SparkSpecBase {
  import spark.implicits._

  test("blocked edit pairs equal brute force across edit kinds") {
    val rows = Seq(
      (1L, "acme corp"),     // base
      (2L, "acme corq"),     // substitution (dist 1)
      (3L, "acme cor"),      // deletion (dist 1)
      (4L, "acme corps"),    // insertion (dist 1)
      (5L, "acme corp"),     // exact duplicate (dist 0)
      (6L, "acme co"),       // dist 2 from base — excluded
      (7L, "zenith ltd"))    // unrelated
      .toDF("id", "name")
    val blocked = Entity.editPairs(rows, "id", "name")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"blocking missed ${brute -- blocked}, extra ${blocked -- brute}")
    assert(brute.contains((1L, 2L)) && brute.contains((1L, 3L)) &&
      brute.contains((1L, 4L)) && brute.contains((1L, 5L)))
    assert(!brute.contains((1L, 6L)) && !brute.exists(_._2 == 7L))
    // dist-1 neighbors of the DELETION also pair with it (3,5 is dist 1)
    val dists = Entity.editPairs(rows, "id", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    assert(dists((1L, 5L)) == 0 && dists((1L, 2L)) == 1)
    // maxEdit > 2 is refused, not silently incomplete
    intercept[IllegalArgumentException] {
      Entity.editPairs(rows, "id", "name", maxEdit = 3)
    }
  }

  test("distance-2 pairs equal brute force, including planted two-typo cases") {
    val rows = Seq(
      (1L, "acme corp"),      // base
      (2L, "acmo corq"),      // two substitutions (dist 2)
      (3L, "acme c"),         // two deletions... actually dist 3 — excluded
      (4L, "acme corporal"),  // three insertions — excluded
      (5L, "amce corp"),      // transposition = 2 edits (dist 2)
      (6L, "acme co"),        // two deletions (dist 2)
      (7L, "acme corpse"),    // two insertions (dist 2)
      (8L, "zenith ltd"))     // unrelated
      .toDF("id", "name")
    val blocked = Entity.editPairs(rows, "id", "name", maxEdit = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"deletion-2 blocking missed ${brute -- blocked}, extra ${blocked -- brute}")
    assert(brute.contains((1L, 2L)) && brute.contains((1L, 5L)) &&
      brute.contains((1L, 6L)) && brute.contains((1L, 7L)))
    assert(!brute.contains((1L, 4L)) && !brute.exists(_._2 == 8L))
    // exact distances are attached and correct
    val d2 = Entity.editPairs(rows, "id", "name", maxEdit = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    assert(d2((1L, 2L)) == 2 && d2((1L, 5L)) == 2 && d2((1L, 6L)) == 2)
  }

  test("over-length names at maxEdit=2 route through the brute leg, never vanish") {
    // ADVICE r10: rows past Del2MaxLen used to be silently filtered, so
    // even an exact duplicate of a long name disappeared from the pairs
    val long1 = "x" * (Entity.Del2MaxLen + 10)
    val long2 = "x" * (Entity.Del2MaxLen + 10)          // dist 0 from long1
    val long3 = "x" * (Entity.Del2MaxLen + 9) + "yz"    // dist 2 from long1
    val edge  = "x" * Entity.Del2MaxLen                 // at the cap: fast leg
    val edgeN = "x" * (Entity.Del2MaxLen + 1)           // dist 1 across the cap
    val rows = Seq(
      (1L, long1), (2L, long2), (3L, long3), (4L, edge), (5L, edgeN),
      (6L, "acme corp"), (7L, "acme corq"), (8L, "zenith ltd"))
      .toDF("id", "name")
    val got = Entity.editPairs(rows, "id", "name", maxEdit = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"over-length routing missed ${brute -- got}, extra ${got -- brute}")
    // the specific holes: long×long exact dup, long×long dist 2,
    // and a pair STRADDLING the cap (fast-leg row × brute-leg row)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((4L, 5L)) && got.contains((6L, 7L)))
    // blocked variant stays complete too (brute leg respects the block)
    val blocked = rows.withColumn("blk", col("id") % 2)
    val gotB = Entity.editPairs(blocked, "id", "name", maxEdit = 2,
        blockCol = Some("blk"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteB = blocked.as("a").crossJoin(blocked.as("b"))
      .filter(col("a.id") < col("b.id") && col("a.blk") === col("b.blk") &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotB == bruteB,
      s"blocked over-length routing missed ${bruteB -- gotB}, extra ${gotB -- bruteB}")
  }

  test("persisted signature index serves the inline pair set; appends stay complete") {
    // a planted mix exercising both legs: short names (fast leg) and an
    // over-length pair (brute leg), split across two "batches"
    val longA = "x" * 70
    val base = Seq(
      (1L, "acme corp", 0), (2L, "acmo corq", 0), // dist 2 via keys
      (3L, "zenith ltd", 0), (4L, "zenith ltd", 1), // same name, other block
      (10L, longA, 0), (11L, longA + "y", 0)) // long pair, brute leg
      .toDF("id", "name", "blk_attr")
    val batch = Seq(
      (20L, "acme corq", 0), // dist 1 to #1, dist 1 to #2 — new keys
      (21L, longA, 0)) // long dup of #10 — brute leg via appended /long
      .toDF("id", "name", "blk_attr")
    val all = base.unionByName(batch)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-edit2-idx").toString
    Entity.writeEdit2Index(base, "id", "name", Some("blk_attr"), dir)
    Entity.appendEdit2Index(batch, "id", "name", Some("blk_attr"), dir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "edit_dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val served = pairSet(Entity.edit2PairsFromIndex(spark, dir, all,
      "id", "name", Some("blk_attr")))
    val inline = pairSet(Entity.editPairs(all, "id", "name",
      maxEdit = 2, blockCol = Some("blk_attr")))
    assert(served == inline,
      s"index served ${served -- inline} extra, missed ${inline -- served}")
    // cross-batch completeness specifically: pairs spanning build+append
    assert(served.contains((1L, 20L, 1)) && served.contains((2L, 20L, 1)),
      "cross-batch short pair missing — appended keys not joined")
    assert(served.contains((10L, 21L, 0)),
      "cross-batch long pair missing — appended /long rows not paired")
    // blocking still separates: identical names in different blocks
    assert(!served.exists(p => p._1 == 3L && p._2 == 4L))
  }

  test("null blocks pair identically in the fast and brute legs") {
    // ADVICE r11: the fast leg hashes the block into the join key, where
    // null folds consistently (two null-block rows pair); the brute leg
    // used a plain === that is never true for nulls, so an over-length
    // name with a null block could never pair. Both legs must agree.
    val longA = "x" * (Entity.Del2MaxLen + 10)
    val longB = "x" * (Entity.Del2MaxLen + 9) + "y"   // dist 1 from longA
    val rows = Seq(
      (1L, longA, null.asInstanceOf[java.lang.Long]),
      (2L, longB, null.asInstanceOf[java.lang.Long]),
      (3L, "acme corp", null.asInstanceOf[java.lang.Long]),
      (4L, "acme corq", null.asInstanceOf[java.lang.Long]),
      (5L, "acme corp", java.lang.Long.valueOf(7L)))
      .toDF("id", "name", "blk")
    val got = Entity.editPairs(rows, "id", "name", maxEdit = 2,
        blockCol = Some("blk"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // null-block long×long pairs (brute leg) AND null-block short×short
    // pairs (fast leg); the non-null block 7 pairs with neither
    assert(got == Set((1L, 2L), (3L, 4L)),
      s"null-block legs disagree: $got")
  }
}
