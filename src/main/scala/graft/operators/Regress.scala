package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Trained linear regression by CLOSED-FORM ordinary least squares —
  * the third trained-model family next to the NB classifier
  * ([[Classify]]) and PCA ([[Pca]]): predict an order's total revenue
  * from (item count, total quantity).
  *
  * Training is two exact steps: (1) one distributed aggregate reduces
  * the corpus to the 3×3 normal-equation matrix ΣffᵀΣ and moment vector
  * Σy·f — all EXACT BIGINTs (features are small integers, revenue is
  * exact e4-units via the decimal cast), merged in any order; (2) the
  * driver solves the 3-unknown system by Cramer's rule in BigInt
  * rationals (no float linear algebra at all) and rounds each β to
  * fixed-point micro-units HALF_UP. Serving is map-only integer
  * arithmetic: pred_micro_e4 = c0 + c1·n_items + c2·sum_qty, divided
  * back to dollars only at the edge by an exact power of ten — so the
  * model-inlined DuckDB twin ([[oracleEntries]]) is bit-identical with
  * no division-semantics traps (no integer `div` anywhere: trunc-vs-
  * floor diverges between engines on negatives).
  *
  * Scale shape (100 TB): training state is 12 longs regardless of
  * corpus size (the [[Moments]] argument — sufficient statistics, not
  * data, cross the network); exact while Σy·f < 2⁶³, i.e. past 10⁸
  * orders at these magnitudes, after which the same sums promote to
  * DECIMAL(38,0). Serving adds three multiplies per row inside the
  * existing order-level aggregate. */
object Regress {

  /** micro-units per coefficient: β is stored as round(β·10⁶). */
  private val CoefScale = BigInt(1000000)

  /** (c0, c1, c2) fixed-point micro coefficients per dataset dir. */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** Order-level features: n_items, integer quantity, revenue e4-units. */
  private def features(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("long").as("sum_qty"),
        (sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1) - col("l_discount").cast("decimal(6,2)"))) * 10000)
          .cast("long").as("y_e4"))

  /** Exact normal equations → BigInt Cramer → micro coefficients. */
  private[graft] def train(feats: DataFrame): Array[Long] = {
    val r = feats.select(
      count(lit(1)).as("s00"),
      sum(col("n_items")).as("s01"),
      sum(col("sum_qty")).as("s02"),
      sum(col("n_items") * col("n_items")).as("s11"),
      sum(col("n_items") * col("sum_qty")).as("s12"),
      sum(col("sum_qty") * col("sum_qty")).as("s22"),
      sum(col("y_e4")).as("b0"),
      sum(col("y_e4") * col("n_items")).as("b1"),
      sum(col("y_e4") * col("sum_qty")).as("b2")).head()
    val Seq(s00, s01, s02, s11, s12, s22, b0, b1, b2) =
      (0 until 9).map(i => BigInt(r.getLong(i)))
    val a = Array(Array(s00, s01, s02), Array(s01, s11, s12),
      Array(s02, s12, s22))
    val b = Array(b0, b1, b2)
    def det3(m: Array[Array[BigInt]]): BigInt =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val d = det3(a)
    require(d != 0, "singular design matrix — features are collinear")
    (0 until 3).map { k =>
      val ak = a.map(_.clone())
      (0 until 3).foreach(i => ak(i)(k) = b(i))
      // round(num·10⁶ / d) HALF_UP in exact integers, sign-safe
      val num = det3(ak) * CoefScale
      val (q, rem) = (num /% d)
      val adj =
        if (rem == 0) BigInt(0)
        else if ((rem.abs * 2) >= d.abs) BigInt(num.signum * d.signum)
        else BigInt(0)
      (q + adj).toLong
    }.toArray
  }

  private[graft] def modelFor(dir: String, lineitem: => DataFrame): Array[Long] =
    models.computeIfAbsent(dir, _ => train(features(lineitem)))

  /** Per-order actual vs predicted totals under the trained model. */
  def predict(feats: DataFrame, c: Array[Long]): DataFrame =
    feats
      .withColumn("pred_micro_e4",
        lit(c(0)) + lit(c(1)) * col("n_items") + lit(c(2)) * col("sum_qty"))
      .select(col("o_orderkey"), col("n_items"), col("sum_qty"),
        (col("y_e4").cast("double") / 10000).as("actual_total"),
        (col("pred_micro_e4").cast("double") / 10000000000L).as("pred_total"),
        ((col("y_e4").cast("double") / 10000) -
          (col("pred_micro_e4").cast("double") / 10000000000L)).as("residual"))

  def qRegressOrderTotal(spark: SparkSession, dir: String): DataFrame = {
    val c = modelFor(dir, Tables.lineitem(spark, dir))
    predict(features(Tables.lineitem(spark, dir)), c)
      .orderBy(col("o_orderkey"))
  }

  /** Model-inlined twin (the [[Pca.oracleEntries]] rule: emitted only
    * when exactly one trained dataset is cached — Verify's case). All
    * integer arithmetic; doubles appear only as the final exact
    * power-of-ten edge divisions, identical in both engines. */
  def oracleEntries: Map[String, String] =
    if (models.size == 1) {
      val c = models.values.iterator.next
      Map("regress_order_total" ->
        s"""WITH f AS (
           |  SELECT l_orderkey AS o_orderkey,
           |    CAST(count(*) AS BIGINT) AS n_items,
           |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT) AS sum_qty,
           |    CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
           |      * (1 - CAST(l_discount AS DECIMAL(6,2)))) * 10000 AS BIGINT) AS y_e4
           |  FROM lineitem GROUP BY 1),
           |p AS (
           |  SELECT *, ${c(0)} + ${c(1)} * n_items + ${c(2)} * sum_qty
           |    AS pred_micro_e4 FROM f)
           |SELECT o_orderkey, n_items, sum_qty,
           |  CAST(y_e4 AS DOUBLE) / 10000 AS actual_total,
           |  CAST(pred_micro_e4 AS DOUBLE) / 10000000000 AS pred_total,
           |  (CAST(y_e4 AS DOUBLE) / 10000)
           |    - (CAST(pred_micro_e4 AS DOUBLE) / 10000000000) AS residual
           |FROM p ORDER BY o_orderkey""".stripMargin)
    } else Map.empty
}
