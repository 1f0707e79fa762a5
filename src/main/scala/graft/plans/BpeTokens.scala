package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokenization as a native, codegen'd Catalyst expression — the
  * trained-BPE apply step of an LLM data pipeline (token counting for
  * budget/mixture decisions, sequence packing, vocabulary coverage).
  *
  * The trained model (an ordered merge list, see
  * [[graft.operators.Tokenize]]) rides as a codegen REFERENCE OBJECT —
  * the [[MatVec]] discipline — so the generated code is a single method
  * call whose size is O(1) in the vocabulary: stages stay inside
  * whole-stage codegen no matter how many merges the tokenizer learned.
  *
  * Apply semantics (shared verbatim with the generated DuckDB twin):
  * each whitespace word starts as its codepoint sequence; merges are
  * applied IN RANK ORDER, each replacing adjacent (a, b) token pairs
  * left-to-right non-overlapping — Sennrich's original apply loop. A
  * later merge can never enable an earlier one (pair (x, a·b) can only
  * be LEARNED after (a, b) existed, so its rank is always higher),
  * which is what makes the single in-order scan complete.
  *
  * Scale shape (100 TB): map-only — the expression consumes the
  * already-projected words array and emits the flattened subword
  * array; no shuffle, no state. Word frequencies are Zipfian, so a
  * bounded per-executor memo (`MemoCap` entries) makes the amortized
  * cost per word O(1) lookups for the head of the distribution.
  */
object BpeTokens {

  /** Memo bound per model instance (per executor after broadcast of the
    * plan references): caps worst-case memory on adversarial corpora
    * while covering the Zipf head of any real one. */
  val MemoCap = 100000

  /** A trained BPE model: `merges(r) = Array(a, b)` is the rank-(r+1)
    * merge. Value equality on the merge list (expression
    * canonicalization compares constructor args) and a compact toString
    * (the [[MatVec.Mat]] discipline). */
  final class Bpe(val merges: Array[Array[String]]) extends Serializable {
    override def equals(o: Any): Boolean = o match {
      case b: Bpe =>
        merges.length == b.merges.length &&
          merges.indices.forall(i =>
            java.util.Arrays.equals(
              merges(i).asInstanceOf[Array[AnyRef]],
              b.merges(i).asInstanceOf[Array[AnyRef]]))
      case _ => false
    }
    override def hashCode: Int =
      java.util.Arrays.deepHashCode(merges.asInstanceOf[Array[AnyRef]])
    override def toString: String = s"bpe[${merges.length} merges]"

    @transient private lazy val memo =
      new ConcurrentHashMap[String, Array[UTF8String]]()

    /** One word → its subword tokens, memoized. */
    def tokenizeWord(w: String): Array[UTF8String] = {
      val hit = memo.get(w)
      if (hit != null) return hit
      val toks = encode(w)
      if (memo.size < MemoCap) memo.put(w, toks)
      toks
    }

    /** The raw merge loop: codepoint symbols, merges in rank order,
      * leftmost non-overlapping replacement per rank. */
    private def encode(w: String): Array[UTF8String] = {
      if (w.isEmpty) return Array.empty
      var syms: Array[String] =
        w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      var r = 0
      while (r < merges.length && syms.length > 1) {
        val a = merges(r)(0); val b = merges(r)(1)
        var i = 0; var changed = false
        // cheap presence scan before allocating the merged array
        while (i < syms.length - 1 && !changed) {
          if (syms(i) == a && syms(i + 1) == b) changed = true else i += 1
        }
        if (changed) {
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.toArray
        }
        r += 1
      }
      syms.map(UTF8String.fromString)
    }

    /** Array-of-words → flattened subword array: the single call both
      * eval and generated code make. */
    def tokenizeAll(words: ArrayData): ArrayData = {
      val n = words.numElements()
      val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n * 2)
      var i = 0
      while (i < n) {
        if (!words.isNullAt(i)) {
          val toks = tokenizeWord(words.getUTF8String(i).toString)
          var j = 0
          while (j < toks.length) { out += toks(j); j += 1 }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  /** `bpe_tokens(words)`: array<string> of words → array<string> of
    * subword tokens, flattened in word order. */
  case class BpeEncode(child: Expression, model: Bpe) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"child must be array<string>, got $other")
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any =
      model.tokenizeAll(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val m = ctx.addReferenceObj("bpe", model, classOf[Bpe].getName)
        s"${ev.value} = $m.tokenizeAll($a);"
      })

    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  /** Column-level entry point: `words` must be an array<string> column
    * (typically [[graft.functions.TextFns.words]]). */
  def bpeTokens(words: Column, model: Bpe): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(words), model))
}
