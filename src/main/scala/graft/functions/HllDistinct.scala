package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hll_distinct(expr)` — HyperLogLog distinct-count sketch (Flajolet et
  * al., AofA 2007) as a native mergeable aggregate, built on the engine's
  * PORTABLE md5 hash family (`Shingles.h60`, the q27/q75 hash) so the
  * register state is bit-reproducible across engines: the DuckDB oracle
  * replays every register from the same
  * `('0x' || substr(md5('129:' || w), 1, 15))::BIGINT` arithmetic
  * (q129). Spark's own `approx_count_distinct` is also HLL but hashes
  * with xxhash64 internals that no external system replays — fine for
  * estimates, useless as a cross-engine contract.
  *
  * Geometry: p = 9 → m = 512 registers. The 60-bit hash splits into
  * `bucket = h % 512` and a 51-bit remainder `w = h / 512`; the register
  * value is the rank `rho = (leading zeros of w within 51 bits) + 1 =
  * nlz64(w) − 12`, in [1, 52] (w = 0 → 52). Update keeps the max rank
  * per bucket; merge is pointwise max — fully order- and
  * partition-independent, so the sketch state (unlike a float sum) is
  * EXACTLY deterministic under any distribution of the data.
  *
  * Output is the integer register summary, not a float estimate —
  * `struct<n_zero:int, sum_rho:bigint, reg_fp:bigint, z_scaled:bigint>`
  * — so the FP estimator formula can live IN the query (mirrored by the
  * oracle) while the aggregate's contract stays exact-integer:
  *   - `n_zero`   — empty registers (drives the linear-counting branch),
  *   - `sum_rho`  — Σ M_j, a quick register-mass pin,
  *   - `reg_fp`   — Σ (j+1)·M_j, an order-weighted fingerprint that pins
  *                  WHICH buckets hold which ranks (≤ 512·512·52 ≈ 1.4e7),
  *   - `z_scaled` — Σ 2^(52−M_j) as an EXACT integer (max 512·2^52 =
  *                  2^61 < 2^63): the harmonic-mean denominator scaled by
  *                  2^52, so the estimate `α·m²·2^52 / z_scaled` is one
  *                  deterministic double division of exact integers —
  *                  no order-dependent float summation anywhere.
  *
  * This is the 100 TB "distinct users / tokens / URLs per stratum"
  * shape: 512-byte buffers partial-aggregate map-side and merge across
  * any shuffle tree, where an exact distinct shuffles the full key
  * universe. Re-expresses the reference's status-rollup distinct tallies
  * (study_scraper/status.py:80-222) at sketch scale.
  */
private[functions] object HllCore {
  val m = 512

  /** One value into the register file: bucket = h % 512, rank =
    * nlz64(h / 512) − 12 ∈ [1, 52], keep the max. */
  def add(buf: Array[Byte], s: String): Unit = {
    val h = Shingles.h60(129, s)
    val bucket = (h % m).toInt
    val rho = java.lang.Long.numberOfLeadingZeros(h / m) - 12
    if (rho > buf(bucket)) buf(bucket) = rho.toByte
  }

  def mergeMax(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }
}

case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = 512

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_distinct requires a string column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n_zero", IntegerType, nullable = false),
    StructField("sum_rho", LongType, nullable = false),
    StructField("reg_fp", LongType, nullable = false),
    StructField("z_scaled", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) HllCore.add(buf, v.toString)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllCore.mergeMax(buf, other)

  override def eval(buf: Array[Byte]): Any = {
    var nZero = 0
    var sumRho = 0L
    var regFp = 0L
    var zScaled = 0L
    var j = 0
    while (j < m) {
      val r = buf(j).toInt
      if (r == 0) nZero += 1
      sumRho += r
      regFp += (j + 1).toLong * r
      zScaled += 1L << (52 - r)
      j += 1
    }
    InternalRow(nZero, sumRho, regFp, zScaled)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
  override def prettyName: String = "hll_distinct"
}

/** `hll_regs(expr)` — the same HLL register file as `hll_distinct`, but
  * emitted RAW (`array<int>`, 512 ranks) instead of summarized. The raw
  * form is what makes the sketch a WAREHOUSE PRIMITIVE rather than a
  * one-shot estimate: a fine-grain run (per day, per source) persists
  * its register arrays once, and any coarser grain is re-aggregated
  * later from the arrays alone via [[HllMergeRegs]] — no second pass
  * over raw data, the q135 rollup contract. Summaries (n_zero,
  * z_scaled, the estimate) are higher-order array functions over the
  * output, kept in the query so the oracle mirrors them. */
case class HllRegs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_regs requires a string column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllCore.m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) HllCore.add(buf, v.toString)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllCore.mergeMax(buf, other)

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegs =
    copy(child = newChild)
  override def prettyName: String = "hll_regs"
}

/** `hll_merge_regs(regs)` — SECOND-STAGE aggregation over persisted
  * [[HllRegs]] arrays: pointwise max across rows, yielding exactly the
  * register file a direct sketch of the union would produce (max is
  * associative/commutative/idempotent, so any merge tree — including
  * re-merging overlapping grains — is exact). This is the re-aggregation
  * half of the q135 rollup contract; the q135 query pins
  * merge(fine grains) ≡ direct(union) register-for-register. */
case class HllMergeRegs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_merge_regs requires array<int> registers, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllCore.m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == HllCore.m,
        s"hll_merge_regs expects ${HllCore.m} registers, got ${arr.numElements()}")
      var j = 0
      while (j < HllCore.m) {
        val r = arr.getInt(j)
        if (r > buf(j)) buf(j) = r.toByte
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllCore.mergeMax(buf, other)

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeRegs =
    copy(child = newChild)
  override def prettyName: String = "hll_merge_regs"
}
