package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `hist_sketch(expr)` — mergeable quantile histogram over non-negative
  * BIGINT values (HdrHistogram geometry, Tene's recording rule; the
  * mergeable-summaries framing is Agarwal et al., PODS 2012): base-2
  * exponent buckets refined by the top 4 mantissa bits, so every bucket's
  * width is ≤ 1/16 of its lower bound and any quantile read from the
  * histogram carries ≤ 6.25% relative error by construction.
  *
  * Bucket function (pure integer arithmetic, replayed bit-for-bit by the
  * q137 oracle from `length(bin(v))`):
  *
  *   v < 32            → bucket = v                     (exact region)
  *   v ≥ 32, e=⌊log₂v⌋ → bucket = (e−4)·16 + (v >> (e−4))
  *
  * which is monotone and lands in [0, 960) for the full Long range
  * (e ≤ 62 → max bucket 959). The inverse lower bound is
  * `(bucket%16 + 16) << (bucket div 16 − 1)` for bucket ≥ 32, `bucket`
  * below. Negative inputs clamp to bucket 0 (documented; callers feed
  * integer micro-units that are non-negative by construction), nulls are
  * skipped.
  *
  * Update increments one counter; merge is pointwise sum — order- and
  * partition-independent, so the 960-cell state is exactly deterministic
  * and re-aggregates across ANY grain (per-group sketches sum to the
  * global sketch cell-for-cell, which q137 pins as
  * `merge_matches_direct`). Output is the raw `array<bigint>` of counts;
  * quantiles are a cumulative walk over 960 post-aggregate-small cells.
  *
  * This is the 100 TB percentile shape: p50/p90/p99 of a measure need an
  * 7.5 KiB buffer that partial-aggregates map-side and one tiny shuffle
  * of cells — never the global per-group sort an exact percentile costs
  * (q137 runs that exact leg beside it as the verification column and
  * the deleted cost). The quantile companion to the engine's HLL
  * (distinct), CMS (frequency), SpaceSaving (top-k), KMV (overlap) and
  * Bloom (membership) sketches. Re-expresses the reference's summary
  * percentile reporting (study_scraper/status.py:80-222,
  * transform/polls.py:212-214) at sketch scale.
  */
case class HistSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import HistSketch.Buckets

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hist_sketch requires a bigint column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(HistSketch.bucketOf(v.asInstanceOf[Long])) += 1L
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Buckets) {
      buf(j) += other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 * Buckets)
    out.asLongBuffer().put(buf)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](Buckets)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketch =
    copy(child = newChild)
  override def prettyName: String = "hist_sketch"
}

object HistSketch {
  /** 60 octaves × 16 sub-buckets minus the folded exact region. */
  val Buckets = 960

  /** See the class doc; clamps negatives to 0. */
  def bucketOf(v0: Long): Int = {
    val v = if (v0 < 0L) 0L else v0
    if (v < 32L) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - 4) * 16 + (v >>> (e - 4))).toInt
    }
  }

  /** Inclusive lower bound of a bucket — the quantile estimate value. */
  def lowerBound(bucket: Int): Long =
    if (bucket < 32) bucket.toLong
    else ((bucket % 16) + 16).toLong << (bucket / 16 - 1)

  // --- SQL fragments shared by the sketch's consumers (q137/q138/q140):
  // the cumulative walk and bucket algebra as in-row array expressions,
  // never a posexplode + window over cells ---

  /** Running-sum array over a 960-cell histogram column (960 fold steps
    * per row — use only on post-aggregate-small frames, and keep a
    * projection barrier between this and any lambda consuming it, or
    * CollapseProject re-inlines the fold per lambda iteration). */
  def cumSql(h: String): String =
    s"aggregate($h, struct(array_repeat(0L, 0) AS a, 0L AS s), " +
      s"(acc, x) -> struct(array_append(acc.a, acc.s + x) AS a, " +
      s"(acc.s + x) AS s), acc -> acc.a)"

  /** Bucket index of a non-negative BIGINT value column (the class-doc
    * formula via length(bin(v)) = ⌊log₂v⌋ + 1). */
  def posSql(v: String): String =
    s"CASE WHEN $v < 32 THEN CAST($v AS INT) " +
      s"ELSE CAST((length(bin($v)) - 5) * 16 + " +
      s"shiftrightunsigned($v, length(bin($v)) - 5) AS INT) END"

  /** Inclusive lower bound of a bucket-index column — the quantile
    * estimate value. */
  def lbSql(pos: String): String =
    s"CASE WHEN $pos < 32 THEN CAST($pos AS BIGINT) " +
      s"ELSE shiftleft(CAST($pos % 16 + 16 AS BIGINT), $pos DIV 16 - 1) END"

  /** Weighted cell fingerprint Σ (pos+1)·cnt of a histogram column. */
  def fpSql(h: String): String =
    s"aggregate(zip_with($h, sequence(1, 960), (c, i) -> c * i), " +
      s"0L, (a, x) -> a + x)"
}
