package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_dot(a, b)` — sequential-fold dot product of two
  * `array<double>` vectors: exactly
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  * including its edge semantics — zip_with pads the shorter array, a
  * padded (or null) element makes the product null, and a null product
  * nulls the whole fold — but as one codegen'd loop instead of an
  * interpreted lambda walk per element (the HOF pair costs ~40
  * interpreter dispatches per 64-dim pair; the ANN family evaluates it
  * per candidate row). Left-fold order is preserved, so results are
  * BIT-identical to the HOF form and to DuckDB's list_dot_product
  * (ExpressionPropertySpec pins both the happy path and the
  * length-mismatch/null-element edges).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Return type left inferred — AbstractDataType is private[sql] (same
  // note as BigramJaccard); the covariant Seq[ArrayType] satisfies the
  // override.
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}Box = graft.functions.VecDot.compute($a, $b);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
       """.stripMargin
    })
    result
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Null ⟺ the HOF form is null: unequal lengths (zip_with pads with
    * null → null product) or any null element. Otherwise the plain
    * left-fold sum of pairwise products. Boxed so codegen can carry the
    * null without an extra out-param. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
