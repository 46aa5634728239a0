package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `topk(expr, k)` — the k largest values of `expr` in ONE aggregation
  * pass, returned as a DESC-sorted array. [[Max2]] generalized from its
  * two slots to a bounded heap; multiset semantics (duplicates kept).
  *
  * The 100 TB motivation is Max2's, at any k: "top-k rows per group" via
  * `row_number() <= k` sorts EVERY group's full row set under a
  * per-group window — a skew cliff when one group holds billions — and
  * `ORDER BY … LIMIT k` only works for one global group. A k-slot heap
  * partial-aggregates map-side like any max (each partition ships at
  * most k values, merge pushes into the same heap), so grouped top-k
  * becomes a plain hash aggregate: no per-group sort, no skew cliff,
  * k·|groups| bytes over the wire. Pair with a struct value
  * (`topk(struct(score, id), 3)`) for argmax-style top-k with a total
  * tie-break order — struct comparison is lexicographic, the same
  * interpreted ordering Spark's own max uses.
  *
  * Deterministic for any input order whenever the value's order is total
  * (make it total by appending a unique column to the struct): the
  * result is exactly the multiset's k largest. Nulls are skipped like
  * every Spark aggregate; an all-null group yields an empty array.
  */
case class TopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"topk k must be >= 1, got $k")
    else TypeUtils.checkForOrderingExpr(child.dataType, "function topk")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  /** Min-heap (reverse ordering): the head is the weakest survivor, the
    * O(log k) eviction point. */
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ordering.reverse)

  /** The one admission path: copy only on acceptance (update feeds values
    * that may point into a reused row buffer; merge feeds already-owned
    * copies). */
  private def offer(heap: mutable.PriorityQueue[Any], v: Any,
                    copy: Boolean): Unit =
    if (heap.size < k) heap.enqueue(if (copy) InternalRow.copyValue(v) else v)
    else if (ordering.gt(v, heap.head)) {
      heap.dequeue()
      heap.enqueue(if (copy) InternalRow.copyValue(v) else v)
    }

  override def update(heap: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v, copy = true)
    heap
  }

  override def merge(heap: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(offer(heap, _, copy = false))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(heap.toArray.sorted(ordering).reverse)

  private def valueBytes(v: Any): Array[Byte] = {
    val r = proj(InternalRow(v))
    java.util.Arrays.copyOf(r.getBytes, r.getSizeInBytes)
  }

  override def serialize(heap: mutable.PriorityQueue[Any]): Array[Byte] = {
    val payloads = heap.toArray.map(valueBytes)
    val out = ByteBuffer.allocate(4 + payloads.map(4 + _.length).sum)
    out.putInt(payloads.length)
    payloads.foreach { b => out.putInt(b.length); out.put(b) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = ByteBuffer.wrap(bytes)
    val heap = createAggregationBuffer()
    var n = in.getInt
    while (n > 0) {
      val len = in.getInt
      val payload = new Array[Byte](len)
      in.get(payload)
      val row = new UnsafeRow(1)
      row.pointTo(payload, len)
      heap.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      n -= 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopK =
    copy(child = newChild)
  override def prettyName: String = "topk"
}
