package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for character-trigram Jaccard similarity —
  * the pg_trgm `similarity()` equivalent (migrations/0006_title_dedup.sql:
  * 51-72), SURVEY.md §2.14's one justified custom Expression.
  *
  * Semantics match the composed higher-order-function form
  * (`array_distinct(transform(...))` + intersect/union sizes) exactly —
  * distinct trigram sets of the raw input, |∩| / |∪| as a double — but in
  * ONE pass per row-pair with two small hash sets, instead of
  * materializing two ArrayData, an intersect and a union per comparison.
  * Codegen emits a static call, so the expression stays inside
  * WholeStageCodegen like any built-in.
  */
case class TrigramSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "trigram_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    TrigramSimilarity.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TrigramSimilarity.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramSimilarity =
    copy(left = newLeft, right = newRight)
}

object TrigramSimilarity {

  /** Distinct-trigram Jaccard; inputs shorter than 3 chars have empty sets
    * (similarity 0, matching the HOF form's length(name) >= 3 guard). */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val sa = trigramSet(a.toString)
    val sb = trigramSet(b.toString)
    if (sa.isEmpty && sb.isEmpty) return 0.0
    var inter = 0
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    val it = small.iterator
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def trigramSet(s: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    var i = 0
    while (i + 3 <= s.length) { set.add(s.substring(i, i + 3)); i += 1 }
    set
  }
}
