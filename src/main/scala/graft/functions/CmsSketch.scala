package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cms_sketch(expr)` — Count–Min frequency sketch (Cormode &
  * Muthukrishnan, J. Algorithms 2005) as a native mergeable aggregate:
  * d = 4 rows × w = 256 columns of exact Long counters. Row r hashes an
  * item with the engine's PORTABLE md5 family —
  * `bucket_r = h60("130", s"$r:$item") % 256`, i.e. DuckDB's
  * `('0x' || substr(md5(concat(130, ':', r, ':', item)), 1, 15))::BIGINT
  * % 256` — so the ENTIRE 1024-cell matrix is integer-exactly
  * replayable by the q130 oracle (each cell is a plain per-bucket count;
  * the sketch is a group-by the fixed geometry makes constant-size).
  *
  * Update adds 1 to one cell per row; merge is pointwise sum — order-
  * and partition-independent, so the matrix is exactly deterministic
  * under any data distribution. A point estimate is
  * `min_r cell[r][bucket_r(item)]`, which upper-bounds the true count
  * always (every occurrence lands in all four cells) and overshoots only
  * by colliding mass — ε = e/w ≈ 1.1% of stream length at failure
  * probability e^−d ≈ 1.8%.
  *
  * Output is the raw matrix `array<bigint>` (row-major, 1024 cells);
  * estimates are `element_at` lookups in the query. This is the 100 TB
  * "how often does THIS token/domain/user occur" shape: an 8 KiB buffer
  * partial-aggregates map-side and merges across any shuffle tree,
  * answering point frequency queries without shuffling the key universe
  * — the mergeable companion to `heavy_hitters` (which finds WHICH keys
  * are frequent; CMS answers HOW frequent a given key is). Re-expresses
  * the reference's per-key status tallies (study_scraper/status.py:80-222)
  * at sketch scale.
  */
case class CmsSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val d = 4
  private val w = 256

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a string column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      val s = v.toString
      var r = 0
      while (r < d) {
        buf(r * w + (Shingles.h60(130, s"$r:$s") % w).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < d * w) {
      buf(j) += other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 * d * w)
    out.asLongBuffer().put(buf)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](d * w)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
  override def prettyName: String = "cms_sketch"
}
