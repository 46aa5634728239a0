package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}

/** Native Catalyst expression for sparse cosine similarity between two
  * term-sorted sparse vectors, each an `array<struct<term:string,
  * w:double>>` sorted ascending by term (T5 at scale — the distributed
  * form of `Clustering.cosineSparse`, reference clustering.py:125-137).
  *
  * Value-identical to `cosineSparse` on the same Map: the weights the
  * vectors carry are integer-valued (1.0 token counts and 2.0 concept
  * weights), so dot and squared norms are exact in FP regardless of
  * accumulation order, and the `dot / (sqrt(na) * sqrt(nb))` form
  * mirrors cosineSparse exactly (including the dot == 0 → 0.0 early
  * exit). A merge walk over the two sorted arrays computes the dot in
  * O(|a| + |b|) with no per-pair allocation; codegen emits a static
  * call, so the candidate-pair filter of the clustering edge build stays
  * inside WholeStageCodegen.
  */
case class SparseCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_cosine"

  // analysis-time shape check (name-agnostic: any array<struct<string,
  // double>> qualifies — callers alias the fields freely): misuse fails
  // as a clean AnalysisException, not an execution-time ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StructType(fields), _) =>
        fields.length == 2 &&
          fields(0).dataType == StringType && fields(1).dataType == DoubleType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<struct<term:string, w:double>> " +
        s"arguments, got ${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SparseCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SparseCosine.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseCosine =
    copy(left = newLeft, right = newRight)
}

object SparseCosine {

  /** Both arrays MUST be sorted ascending by term (Spark's `sort_array`
    * on array<struct> orders by the first field with binary UTF8
    * comparison — the same ordering `UTF8String.compareTo` walks here).
    * Terms are distinct within a vector by construction (they come from a
    * Map). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0
    var sa = 0.0
    var i = 0
    while (i < na) { val w = a.getStruct(i, 2).getDouble(1); sa += w * w; i += 1 }
    var sb = 0.0
    var j = 0
    while (j < nb) { val w = b.getStruct(j, 2).getDouble(1); sb += w * w; j += 1 }
    var dot = 0.0
    i = 0
    j = 0
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c == 0) { dot += ra.getDouble(1) * rb.getDouble(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (dot == 0.0) 0.0
    else dot / (math.sqrt(sa) * math.sqrt(sb))
  }
}
