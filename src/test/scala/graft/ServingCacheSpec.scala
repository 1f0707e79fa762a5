package graft

import java.nio.file.{Files, Paths}

/** Pins the serving-artifact registry (graft.Serving): collision-proof
  * path keying on the full dataset dir, build-once semantics, and
  * rebuild when the source data is newer than the artifact (ADVICE r8:
  * the old 32-bit hashCode key could alias two dirs, and a fixture
  * regenerated mid-JVM was served stale from a first-call cache). */
class ServingCacheSpec extends SparkSpecBase {

  test("artifact paths embed the full dir and never alias distinct dirs") {
    val p1 = Serving.artifactPath("idx", "/root/testdata/sf0.01")
    val p2 = Serving.artifactPath("idx", "/root/testdata/sf0.1")
    assert(p1 != p2)
    assert(p1.contains("root_testdata_sf0.01"))
    // stable across calls (it is an on-disk cache key)
    assert(p1 == Serving.artifactPath("idx", "/root/testdata/sf0.01"))
    // same dir, different kind → different artifact
    assert(Serving.artifactPath("codes", "/root/testdata/sf0.01") != p1)
  }

  test("build stages to a temp path and a failed build leaves the old artifact intact") {
    val src = Files.createTempDirectory("graft-serving-src2")
    Files.writeString(src.resolve("part-0.parquet"), "v1")
    var stagedPath: String = null
    val p = Serving.buildOnce("spec_stage", src.toString) { bp =>
      stagedPath = bp
      Files.createDirectories(Paths.get(bp))
      Files.writeString(Paths.get(bp, "payload"), "good")
    }
    // the callback never writes the final path directly (ADVICE r9:
    // a concurrent process must not observe a half-written artifact)
    assert(stagedPath != p && stagedPath.startsWith(p))
    assert(Files.readString(Paths.get(p, "payload")) == "good")
    // invalidate, then fail the rebuild: the old artifact must survive
    Files.setLastModifiedTime(src.resolve("part-0.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        Serving.newestSourceMtime(src.toString) + 2000))
    intercept[RuntimeException] {
      Serving.buildOnce("spec_stage", src.toString) { _ =>
        throw new RuntimeException("build exploded")
      }
    }
    assert(Files.readString(Paths.get(p, "payload")) == "good",
      "failed rebuild clobbered the previous artifact")
  }

  test("buildOnce builds once, then rebuilds only when sources get newer") {
    val src = Files.createTempDirectory("graft-serving-src")
    val f = src.resolve("part-0.parquet")
    Files.writeString(f, "v1")
    var builds = 0
    def call(): String = Serving.buildOnce("spec_art", src.toString) { p =>
      builds += 1
      Files.createDirectories(Paths.get(p))
    }
    val p1 = call(); val p2 = call(); val p3 = call()
    assert(p1 == p2 && p2 == p3)
    assert(builds == 1, s"expected a single build, got $builds")
    // a regenerated fixture (newer mtime) must invalidate, same JVM
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Serving.newestSourceMtime(src.toString) + 2000))
    call()
    assert(builds == 2, s"expected rebuild after source touch, got $builds")
    // and the rebuild re-stamps: further calls are cached again
    call()
    assert(builds == 2)
  }
}
