package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Pq, Similarity}
import graft.plans.MatVec

/** The MatVec reference-object kernels exist to replace literal-per-
  * matrix-element compositions that overflowed Janino's 64 KB generated-
  * method limit. These specs pin (a) bit parity against the exact
  * compositions they replaced, (b) the tie-break directions, and (c)
  * that the quantizer stages now actually compile under codegen with
  * fallback DISABLED — the regression the kernels were built to fix. */
class MatVecSpec extends SparkSpecBase {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val cents = Ivf.centroidsFor(sf, Tables.embeddings(spark, sf))

  test("MatDots and ArgMaxDot match the literal scoredCells composition bit-for-bit") {
    // the pre-kernel composition: one literal dot per centroid, struct
    // (score, cell), array_max for the assignment
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        Similarity.dot(col("embedding"), array(c.map(lit).toIndexedSeq: _*)).as("score"),
        lit(i).as("cell"))
    }: _*)
    val rows = emb.select(
      MatVec.dots(col("embedding"), cents).as("kd"),
      transform(scored, s => s.getField("score")).as("ld"),
      MatVec.argMaxDot(col("embedding"), cents).as("kc"),
      array_max(scored).getField("cell").as("lc")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kd = r.getSeq[Double](0); val ld = r.getSeq[Double](1)
      assert(kd.length == cents.length)
      kd.zip(ld).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b), s"kernel $a != composition $b")
      }
      assert(r.getInt(2) == r.getInt(3), "argmax diverged from array_max composition")
    }
  }

  test("NearestCode matches the literal argmin composition on real PQ subvectors") {
    val books = Pq.trainCodebooks(emb, 64)
    val d = 64 / Pq.M
    val sub0 = emb
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .select(transform(slice(col("embedding"), 1, d),
        x => x.cast("double") / col("nrm")).as("sub"))
    val book = books.head
    val scored = array(book.zipWithIndex.map { case (c, i) =>
      struct(
        (lit(0.5 * c.map(x => x * x).sum) -
          Similarity.dot(col("sub"), array(c.map(lit).toIndexedSeq: _*))).as("d"),
        lit(i).as("idx"))
    }: _*)
    val rows = sub0.select(
      MatVec.nearestCode(col("sub"), book).as("kc"),
      array_min(scored).getField("idx").as("lc")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      "nearest-code diverged from array_min composition"))
  }

  test("tie-breaks: argmax takes the LARGER index, nearest-code the SMALLER") {
    // duplicate matrix rows force exact score ties; the directions must
    // replicate array_max-(score,cell) / array_min-(d,idx) struct order
    val mat = Seq(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val df = spark.range(1).select(
      array(lit(1.0f), lit(0.0f)).as("v"))
    val r = df.select(
      MatVec.argMaxDot(col("v"), mat).as("mx"),
      MatVec.nearestCode(col("v"), mat).as("mn")).head()
    assert(r.getInt(0) == 1, s"argmax tie should take index 1, got ${r.getInt(0)}")
    assert(r.getInt(1) == 0, s"nearest-code tie should take index 0, got ${r.getInt(1)}")
  }

  test("quantizer stages compile under codegen with fallback disabled") {
    // before the kernels, these exact stages logged "Code grows beyond
    // 64 KB" and ran interpreted; with fallback off, a regression to
    // that state fails the test instead of silently degrading
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cells = emb.withColumn("cell", Ivf.cellOf(col("embedding"), cents))
        .groupBy(col("cell")).count().collect()
      assert(cells.map(_.getLong(1)).sum == emb.count())
      val books = Pq.trainCodebooks(emb, 64)
      val codes = Pq.encode(emb, books, 64).collect()
      assert(codes.length == emb.count())
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
