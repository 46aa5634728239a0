package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression for word-bigram Jaccard similarity between
  * two word arrays (q70, the dedup family's exact-n-gram member —
  * reference near-dup intent at migrations/0006_title_dedup.sql:51-72,
  * word-gram variant).
  *
  * Value-identical to the composed form — `array_distinct(transform(
  * sequence(1, size(words) - 1), i -> concat(words[i-1], ' ', words[i])))`
  * per side, then `size(array_intersect(a, b)) / (size(a) + size(b) − ∩)`
  * — but in one pass per candidate pair with two small hash sets. The
  * composed form walks every lambda element through the interpreted
  * expression evaluator (higher-order functions are not codegen'd; the
  * q31 MinGramHash lesson), and materializing gram arrays on both sides
  * of a self-join doubles that cost again. Evaluating the pair directly
  * means the build side of the block join carries only the word array it
  * already had, and codegen keeps the whole pair filter inside
  * WholeStageCodegen.
  */
case class BigramJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bigram_jaccard"
  // analysis-time type check: a misuse (e.g. a raw string instead of the
  // split() word array) fails as a clean AnalysisException instead of a
  // ClassCastException at execution. Return type left inferred —
  // AbstractDataType is private[sql], so it cannot be NAMED here, but the
  // covariant Seq[ArrayType] satisfies the override.
  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(a: Any, b: Any): Any =
    BigramJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BigramJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramJaccard =
    copy(left = newLeft, right = newRight)
}

object BigramJaccard {

  /** Distinct word-bigram Jaccard; arrays with fewer than 2 elements have
    * empty bigram sets (similarity 0, matching the HOF form's guard). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = bigramSet(a)
    val sb = bigramSet(b)
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var inter = 0
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    val it = small.iterator
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Joined-with-a-space bigram strings, exactly `concat(w[i], ' ',
    * w[i+1])`; null elements cannot occur (split() output) but are
    * skipped defensively rather than NPE'ing. */
  private def bigramSet(arr: ArrayData): java.util.HashSet[String] = {
    val n = arr.numElements()
    val set = new java.util.HashSet[String]()
    var i = 0
    while (i + 1 < n) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1))
        set.add(arr.getUTF8String(i).toString + " " +
          arr.getUTF8String(i + 1).toString)
      i += 1
    }
    set
  }
}
