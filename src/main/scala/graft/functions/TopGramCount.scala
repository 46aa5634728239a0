package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repetition signals' most-frequent-
  * n-gram count (q73, Gopher-style quality filtering): over a word array,
  * the highest occurrence count of any n-gram of adjacent words (n = 1:
  * the words themselves; n = 2: space-joined adjacent pairs — the
  * `zip_with(slice, slice, concat)` composition). Returns 0 when the
  * array has fewer than n elements.
  *
  * Value-identical to the HOF composition it replaces (sort the gram
  * array, fold the longest equal run — most-common-item frequency equals
  * longest-run-after-sort, and any total order groups equals): grams are
  * unambiguous because split-on-whitespace words contain no spaces. The
  * HOF form walks `array_sort` + `aggregate` (and `zip_with` for n = 2)
  * through the interpreted expression evaluator per ELEMENT — the q31
  * lesson; this is one sort + one run-walk per row in the JVM, and
  * codegen emits a static call so the whole quality-signal projection
  * stays inside WholeStageCodegen.
  */
case class TopGramCount(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_gram_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName gram size must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(arr: Any): Any =
    TopGramCount.compute(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TopGramCount.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopGramCount =
    copy(child = newChild)
}

object TopGramCount {

  private val Space = UTF8String.fromString(" ")

  /** Null array elements (impossible from `split`, the only caller shape)
    * count as empty strings rather than NPE'ing. */
  def compute(arr: ArrayData, n: Int): Int = {
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return 0
    val grams = new Array[UTF8String](m)
    var i = 0
    if (n == 1) {
      while (i < m) {
        val w = arr.getUTF8String(i)
        grams(i) = if (w == null) UTF8String.EMPTY_UTF8 else w
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](n)
      while (i < m) {
        var k = 0
        while (k < n) {
          val w = arr.getUTF8String(i + k)
          parts(k) = if (w == null) UTF8String.EMPTY_UTF8 else w
          k += 1
        }
        grams(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var best = 1
    var run = 1
    i = 1
    while (i < m) {
      if (grams(i).equals(grams(i - 1))) {
        run += 1
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    best
  }
}
