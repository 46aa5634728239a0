package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bloom_bits(expr)` — a Bloom filter (Bloom, CACM 1970) over a column
  * of NON-NEGATIVE 60-bit hashes (the q79 gram-hash convention) as a
  * native mergeable aggregate: m = 16384 bits in 256 Long words, k = 3.
  *
  * The probe positions are three DISJOINT 14-bit fields of the 60-bit
  * hash — `bit_0 = h mod 16384`, `bit_1 = (h ÷ 2^14) mod 16384`,
  * `bit_2 = (h ÷ 2^28) mod 16384` — which are genuinely independent
  * for an md5-derived input, so the false-positive rate is the
  * textbook fill^3. (An affine family sharing one folded hash, the
  * first draft here, is NOT: `h ≡ h' (mod m)` collides every affine
  * row at once, degenerating k probes to one and fp to n/m —
  * BloomSpec's stranger-probe test is what caught it.) Exact integer
  * arithmetic throughout, so the oracle can replay the ENTIRE bit
  * set — membership, false-positive counts, and fill — without any
  * bit-twiddling on the SQL side: a set bit is just a distinct
  * `(g ÷ 2^(14·i)) % 16384` value.
  *
  * Update ORs 3 bits; merge is pointwise OR — order- and
  * partition-independent like the engine's other sketches. Output is
  * the raw word array; membership tests are shift-and-mask
  * `element_at` probes in the query.
  *
  * This is the 100 TB decontamination PRE-FILTER shape (q131): the
  * eval-set bloom is a 2 KiB broadcast tested map-side against every
  * train gram, and only the ~fp-rate sliver of candidates reaches the
  * exact gram join (q79's shuffle) — no false negatives by
  * construction, so the filter is safe to push down. Negative inputs
  * are masked to their low 60 bits rather than rejected; null inputs
  * are skipped. */
case class BloomBits(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val words = 256 // 16384 bits

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_bits requires a bigint column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  private def set(buf: Array[Long], bit: Long): Unit = {
    val b = bit.toInt
    buf(b >>> 6) |= 1L << (b & 63)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      set(buf, h & 16383L)
      set(buf, (h >>> 14) & 16383L)
      set(buf, (h >>> 28) & 16383L)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < words) {
      buf(j) |= other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 * words)
    out.asLongBuffer().put(buf)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](words)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)
  override def prettyName: String = "bloom_bits"
}
