package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch state: the counter map plus whether any mass has ever been
  * outside it (an eviction, a merge trim, or a lossy input — while
  * false, untracked items provably have true count 0). */
final class HHState {
  val map: mutable.HashMap[UTF8String, Array[Long]] = mutable.HashMap.empty
  var lossy: Boolean = false
}

/** `heavy_hitters(expr, k)` — SpaceSaving top-k heavy hitters (Metwally,
  * Agrawal & El Abbadi, ICDT 2005) as a native mergeable aggregate:
  * `array<struct<item, count, err>>` sorted by (count DESC, item ASC).
  *
  * The sketch keeps AT MOST k counters regardless of stream length. A
  * tracked item increments its counter; an untracked item steals the
  * minimum counter c_min, entering with count c_min + 1 and error c_min.
  * Estimates obey true ≤ count ≤ true + err; whenever the group's
  * distinct cardinality is ≤ k the sketch is EXACT (count true, err 0) —
  * what the oracle-checked q125 pins; the approximation-mode bounds are
  * pinned by HeavyHittersSpec on adversarial streams.
  *
  * Merge ("Mergeable Summaries", Agarwal et al., PODS 2012, with the
  * floor-carrying refinement that preserves BOTH one-sided bounds):
  * common keys sum count and err pointwise; a key absent from the other
  * sketch adds that sketch's FLOOR — its minimum counter when it has
  * ever been lossy, else 0 — to both count and err. The floor upper-
  * bounds any untracked item's true count (SpaceSaving's c_min
  * invariant; counters only grow, so c_min is non-decreasing, and a
  * merge trim only drops counts ≤ the kept minimum), so `count ≥ true`
  * survives arbitrary merge trees, while `count − err ≤ true` is
  * untouched because the floor lands on both sides. After combining,
  * the result trims to the k largest by (count DESC, item ASC).
  *
  * This is what makes the sketch a real DISTRIBUTED operator: partial
  * sketches build map-side per partition like any sum, and only k-entry
  * buffers cross the wire — the 100 TB shape for "top domains / tokens /
  * users per group" where an exact count would shuffle the full key
  * universe. Eviction and trim tie-break deterministically by (count,
  * item), so exact-mode results are run-stable; under evictions the
  * ESTIMATES are arrival-order-dependent (inherent to the sketch), only
  * the bounds are guaranteed. The min-counter scan is O(k) per
  * eviction — the right trade at the k ≤ a-few-thousand sizes this
  * engine uses (the 2005 paper's stream-summary linked structure is the
  * O(1) upgrade, same contract).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HHState] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a string column, got ${child.dataType.sql}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"heavy_hitters k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HHState = new HHState

  /** Deterministic victim: smallest (count, item). */
  private def minEntry(m: mutable.HashMap[UTF8String, Array[Long]])
      : (UTF8String, Array[Long]) = {
    var best: (UTF8String, Array[Long]) = null
    val it = m.iterator
    while (it.hasNext) {
      val e = it.next()
      if (best == null || e._2(0) < best._2(0) ||
          (e._2(0) == best._2(0) && e._1.compareTo(best._1) < 0)) best = e
    }
    best
  }

  /** Upper bound on any UNTRACKED item's true count in this sketch. */
  private def floor(s: HHState): Long =
    if (s.lossy && s.map.nonEmpty) minEntry(s.map)._2(0) else 0L

  override def update(s: HHState, input: InternalRow): HHState = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      s.map.get(v) match {
        case Some(a) => a(0) += 1L
        case None if s.map.size < k =>
          // the input UTF8String may point into a reused row buffer — own it
          s.map.put(v.clone(), Array(1L, 0L))
        case None =>
          val (victim, va) = minEntry(s.map)
          s.map.remove(victim)
          s.map.put(v.clone(), Array(va(0) + 1L, va(0)))
          s.lossy = true
      }
    }
    s
  }

  override def merge(s: HHState, other: HHState): HHState = {
    val floorS = floor(s)
    val floorO = floor(other)
    if (floorO > 0L) s.map.foreach { case (key, b) =>
      if (!other.map.contains(key)) { b(0) += floorO; b(1) += floorO }
    }
    other.map.foreach { case (key, a) =>
      s.map.get(key) match {
        case Some(b) => b(0) += a(0); b(1) += a(1)
        case None => s.map.put(key, Array(a(0) + floorS, a(1) + floorS))
      }
    }
    s.lossy ||= other.lossy
    if (s.map.size > k) {
      val kept = s.map.toSeq
        .sortWith((x, y) => x._2(0) > y._2(0) ||
          (x._2(0) == y._2(0) && x._1.compareTo(y._1) < 0))
        .take(k)
      s.map.clear()
      kept.foreach { case (key, a) => s.map.put(key, a) }
      s.lossy = true
    }
    s
  }

  override def eval(s: HHState): Any = {
    val sorted = s.map.toSeq.sortWith((x, y) => x._2(0) > y._2(0) ||
      (x._2(0) == y._2(0) && x._1.compareTo(y._1) < 0))
    new GenericArrayData(sorted.map { case (key, a) =>
      InternalRow(key, a(0), a(1))
    }.toArray[Any])
  }

  override def serialize(s: HHState): Array[Byte] = {
    var size = 5
    s.map.foreach { case (key, _) => size += 4 + key.numBytes() + 16 }
    val out = ByteBuffer.allocate(size)
    out.put(if (s.lossy) 1.toByte else 0.toByte)
    out.putInt(s.map.size)
    s.map.foreach { case (key, a) =>
      val b = key.getBytes
      out.putInt(b.length); out.put(b); out.putLong(a(0)); out.putLong(a(1))
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): HHState = {
    val in = ByteBuffer.wrap(bytes)
    val s = new HHState
    s.lossy = in.get() == 1.toByte
    var n = in.getInt
    while (n > 0) {
      val len = in.getInt
      val payload = new Array[Byte](len)
      in.get(payload)
      s.map.put(UTF8String.fromBytes(payload), Array(in.getLong, in.getLong))
      n -= 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
  override def prettyName: String = "heavy_hitters"
}
