package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** `max2(expr)` — the two largest values of `expr` in ONE aggregation
  * pass, returned as `struct<first, second>` (`second` is null for
  * singleton groups; ties land in `second` — multiset top-2).
  *
  * Motivation (q23, latest_poll_standings.sql:18-95): "latest and
  * previous poll per party" is an argmax-top-2. The windowed form
  * (`row_number ≤ 2` over partitionBy(party)) funnels billions of rows
  * through a handful of per-party sort partitions at 100 TB — a skew
  * cliff — and the aggregate form needed TWO full scans (max, then max
  * below it). A constant-size two-slot buffer partial-aggregates
  * map-side like any max, so the second scan disappears and the shape
  * stays skew-free at any scale.
  *
  * Works for any orderable type (struct comparison is lexicographic —
  * the same interpreted ordering Spark's own max uses for structs).
  * Buffers serialize as two length-prefixed UnsafeRow payloads.
  */
case class Max2(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Any]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, "function max2")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def dataType: DataType = StructType(Seq(
    StructField("first", child.dataType),
    StructField("second", child.dataType)))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Any] = new Array[Any](2)

  private def insert(buf: Array[Any], v: Any): Unit =
    if (buf(0) == null || ordering.gt(v, buf(0))) {
      buf(1) = buf(0)
      buf(0) = v
    } else if (buf(1) == null || ordering.gt(v, buf(1))) {
      buf(1) = v
    }

  override def update(buf: Array[Any], input: InternalRow): Array[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // cheap pre-check before the defensive copy: most rows lose to both
      // slots and need no allocation at all
      if (buf(1) == null || ordering.gt(v, buf(1)) || buf(0) == null)
        insert(buf, InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(buf: Array[Any], other: Array[Any]): Array[Any] = {
    if (other(0) != null) insert(buf, other(0))
    if (other(1) != null) insert(buf, other(1))
    buf
  }

  override def eval(buf: Array[Any]): Any =
    if (buf(0) == null) null else InternalRow(buf(0), buf(1))

  private def valueBytes(v: Any): Array[Byte] = {
    // getBytes may return the row's backing array; copy defensively only
    // when needed (UnsafeRow.getBytes already copies unless perfectly
    // aligned to its buffer — either way the result is ours to keep
    // because proj reuses its row, so clone)
    val r = proj(InternalRow(v))
    java.util.Arrays.copyOf(r.getBytes, r.getSizeInBytes)
  }

  override def serialize(buf: Array[Any]): Array[Byte] = {
    val b0 = if (buf(0) == null) null else valueBytes(buf(0))
    val b1 = if (buf(1) == null) null else valueBytes(buf(1))
    val out = ByteBuffer.allocate(
      8 + (if (b0 == null) 0 else b0.length) + (if (b1 == null) 0 else b1.length))
    out.putInt(if (b0 == null) -1 else b0.length)
    if (b0 != null) out.put(b0)
    out.putInt(if (b1 == null) -1 else b1.length)
    if (b1 != null) out.put(b1)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Any] = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new Array[Any](2)
    var i = 0
    while (i < 2) {
      val len = in.getInt
      if (len >= 0) {
        val payload = new Array[Byte](len)
        in.get(payload)
        val row = new UnsafeRow(1)
        row.pointTo(payload, len)
        buf(i) = InternalRow.copyValue(row.get(0, child.dataType))
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Max2 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Max2 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Max2 =
    copy(child = newChild)
  override def prettyName: String = "max2"
}
