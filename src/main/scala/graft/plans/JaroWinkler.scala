package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native, codegen'd Catalyst
  * expression — the fuzzy-match scorer record-linkage uses when edit
  * distance is too coarse (it weights shared prefixes and tolerates
  * transpositions, the shape of human typos in names).
  *
  * Spark ships `levenshtein` but no Jaro–Winkler, and the house rule is
  * zero UDFs (SURVEY §2.10): like [[CosineSimilarity]], this goes
  * native — the matcher runs in [[JaroWinklerKernel.compute]] (a static
  * call from generated code, the [[NormalizeText]] pattern), so pair
  * scoring stays inside whole-stage codegen with no boxing and no
  * Python/Scala closure dispatch.
  *
  * Semantics are pinned to the published algorithm exactly as DuckDB's
  * `jaro_winkler_similarity` implements it (verified value-identical in
  * IEEE double on boundary fixtures, including the jaro = 0.7000…07
  * boost edge): match window ⌊max(l1,l2)/2⌋−1, transpositions counted
  * over matched positions then halved, jaro = (m/l1 + m/l2 + (m−t)/m)/3
  * accumulated left-to-right in double, Winkler boost
  * j + p·0.1·(1−j) applied only when j > 0.7 with prefix p ≤ 4.
  * Identical op ordering ⇒ bit-identical doubles ⇒ downstream integer
  * quantization (floor(j·10⁶)) hash-matches the oracle.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"inputs must be string, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerKernel.compute(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinklerKernel.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-level entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def jwHist(s: Column): Column =
    ColumnBridge.column(JwHist(ColumnBridge.expression(s)))

  def jwHistCandidate(ha: Column, hb: Column, thetaMicro: Long): Column =
    ColumnBridge.column(JwHistCandidate(
      ColumnBridge.expression(ha), ColumnBridge.expression(hb), thetaMicro))
}

/** Per-ROW char histogram for the Jaro match-count bound — computed
  * once per row (map-side), consumed per PAIR by [[JwHistCandidate]] in
  * O(alphabet) with zero allocation, where the full matcher is O(l²)
  * with two mark arrays. Layout: 2 length bytes (big-endian, true
  * UTF-16 length) + 128 count bytes; code units ≥ 128 fold into bucket
  * 127 (folding distinct chars together only RAISES the overlap bound,
  * so the filter stays an implication). */
case class JwHist(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    JaroWinklerKernel.hist(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.JaroWinklerKernel.hist($s);")

  override protected def withNewChildInternal(newChild: Expression): JwHist =
    copy(child = newChild)
}

/** TRUE iff the pair CAN reach jw ≥ thetaMicro/10⁶ under the exact
  * match-count implication: Jaro matches are an injective char pairing,
  * so m ≤ Σ_c min(histA(c), histB(c)), and jw ≥ θ forces
  * jaro ≥ (θ−0.4)/0.6, i.e. m·(l1+l2)·600000 ≥ l1·l2·(3θµ−1800000) —
  * all integer, no false negatives. Pairs that fail are dropped BEFORE
  * the O(l²) matcher runs; survivors still get the exact score. */
case class JwHistCandidate(left: Expression, right: Expression,
    thetaMicro: Long) extends BinaryExpression {

  require(thetaMicro > 600000L,
    s"histogram bound needs θ > 0.6 (got $thetaMicro µ)")

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.BinaryType &&
        right.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"inputs must be binary jw histograms, got " +
        s"${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerKernel.histCandidate(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], thetaMicro)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinklerKernel.histCandidate(" +
        s"$a, $b, ${thetaMicro}L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JwHistCandidate =
    copy(left = newLeft, right = newRight)
}

/** The matcher itself — a standalone object (no companion class) so
  * scalac emits a static forwarder and generated Java calls it
  * directly. Operates on UTF-16 code units (Java chars), which matches
  * DuckDB's byte-wise matcher on ASCII data; both engines treat a
  * supplementary character as two units. */
object JaroWinklerKernel {

  val BoostThreshold = 0.7
  val MaxPrefix = 4
  val PrefixScale = 0.1

  /** Histogram buckets (ASCII; higher code units fold into the last). */
  val HistBuckets = 128

  /** [len_hi, len_lo, counts(128)] — counts clamped at 255, which is
    * exact whenever the string itself is ≤ 255 units (longer strings
    * make [[histCandidate]] pass through rather than risk undercounting
    * the overlap bound). */
  def hist(s: UTF8String): Array[Byte] = {
    val str = s.toString
    val n = math.min(str.length, 65535)
    val out = new Array[Byte](2 + HistBuckets)
    out(0) = ((n >> 8) & 0xff).toByte
    out(1) = (n & 0xff).toByte
    var i = 0
    while (i < n) {
      val b = 2 + math.min(str.charAt(i).toInt, HistBuckets - 1)
      if ((out(b) & 0xff) < 255) out(b) = ((out(b) & 0xff) + 1).toByte
      i += 1
    }
    out
  }

  def histCandidate(ha: Array[Byte], hb: Array[Byte],
      thetaMicro: Long): Boolean = {
    val l1 = ((ha(0) & 0xff) << 8) | (ha(1) & 0xff)
    val l2 = ((hb(0) & 0xff) << 8) | (hb(1) & 0xff)
    // equal empties score jw = 1 — keep them for the exact kernel; a
    // single empty side scores 0 and can never reach θ
    if (l1 == 0 && l2 == 0) return true
    if (l1 == 0 || l2 == 0) return false
    // counts clamp at 255: only exact when no char repeats past 255,
    // guaranteed for strings ≤ 255 units — otherwise pass through
    if (l1 > 255 || l2 > 255) return true
    // length-ratio implication on the SAME UTF-16 unit lengths the
    // matcher uses (a Spark-side length() conjunct counts CODEPOINTS
    // and wrongly dropped qualifying non-BMP pairs): jw ≥ θ forces
    // lmin/lmax ≥ 5θ−4, i.e. lmin·10⁶ ≥ lmax·(5θµ−4·10⁶) when that
    // coefficient is positive
    val ratioMicro = 5L * thetaMicro - 4000000L
    if (ratioMicro > 0) {
      val lmin = math.min(l1, l2).toLong
      val lmax = math.max(l1, l2).toLong
      if (lmin * 1000000L < lmax * ratioMicro) return false
    }
    var overlap = 0L
    var c = 2
    val end = 2 + HistBuckets
    while (c < end) {
      overlap += math.min(ha(c) & 0xff, hb(c) & 0xff)
      c += 1
    }
    // m(1/l1 + 1/l2 + ...)/3 bound cross-multiplied into integers:
    // jw ≥ θ ⇒ jaro ≥ (θ−0.4)/0.6 ⇒ (m/l1 + m/l2 + 1)/3 ≥ (θµ−4e5)/6e5
    overlap * (l1 + l2) * 600000L >= l1.toLong * l2 * (3L * thetaMicro - 1800000L)
  }

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    // match window; negative (both strings length ≤ 2 with max 1) makes
    // every window empty, which the loop bounds below already encode
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var hit = false
      while (j < hi && !hit) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // left-to-right double accumulation — the oracle's op order
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j0 <= BoostThreshold) return j0
    val pmax = math.min(MaxPrefix, math.min(l1, l2))
    var p = 0
    while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
    j0 + p * PrefixScale * (1.0 - j0)
  }
}
