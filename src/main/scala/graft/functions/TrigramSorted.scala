package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Split form of `trigram_similarity` for blocked pair joins (q34/q60):
  * every row's distinct-trigram set was rebuilt PER PAIR by the fused
  * expression — a row in a ~300-candidate block paid ~300 × (60
  * substring allocations + 2 hash sets). `trigram_set(s)` materializes
  * each side's sorted distinct grams ONCE per row before the join;
  * `trigram_sim_sorted(ga, gb)` then counts the intersection with an
  * allocation-free sorted merge per pair. Value-identical to
  * `trigram_similarity(a, b)` — same distinct sets, same |∩|/|∪|
  * double — pinned by ExpressionPropertySpec on random text.
  */
case class TrigramSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "trigram_set"

  override def nullSafeEval(s: Any): Any =
    TrigramSet.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramSet.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramSet =
    copy(child = newChild)
}

object TrigramSet {
  /** Sorted (UTF8String binary order) distinct trigrams; empty for
    * strings shorter than 3 chars — matching trigramSet in
    * TrigramSimilarity, which this precomputes. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.length < 3) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + 3 <= str.length) {
      set.add(UTF8String.fromString(str.substring(i, i + 3)))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

case class TrigramSimSorted(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "trigram_sim_sorted"
  // same private[sql] note as BigramJaccard: inferred return type
  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(a: Any, b: Any): Any =
    TrigramSimSorted.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TrigramSimSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramSimSorted =
    copy(left = newLeft, right = newRight)
}

object TrigramSimSorted {
  /** Jaccard over two SORTED distinct gram arrays (the `trigram_set`
    * output contract): merge-count the intersection, union by
    * inclusion–exclusion. Both-empty → 0.0, matching the fused form. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
