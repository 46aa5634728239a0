package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `kmv_sketch(h, k)` — a K-Minimum-Values (bottom-k) distinct sketch
  * (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007) over a
  * column of NON-NEGATIVE hash values: the k smallest DISTINCT values,
  * ascending. Unlike HLL (q129) the retained state is actual hash
  * values, so two groups' sketches support SET OPERATIONS — the q132
  * corpus-overlap estimator intersects them to estimate Jaccard and
  * intersection cardinality between strata, which registers cannot do.
  *
  * The state is a value set, so it is exactly order- and partition-
  * independent (the k smallest of a multiset do not depend on
  * arrival order); merge is union-then-trim. The oracle replays it as
  * `list(DISTINCT hv ORDER BY hv)[1:k]` — plain SQL, exact integers.
  *
  * Estimators (computed IN the query, mirrored by the oracle, from
  * exact-integer state): with θ = the k-th smallest of the UNION of
  * two sketches (their combined bottom-k), `est_union =
  * (k−1) · 2^60 / θ` (the hash space is the h60 60-bit field), and
  * `est_inter = |A∩B restricted to the union's bottom-k| / k ·
  * est_union` — the standard KMV Jaccard transfer. Degenerate
  * small-set case: when a group has fewer than k distinct values the
  * sketch IS the distinct set and every estimate is exact.
  *
  * 100 TB shape: k·8-byte buffers partial-aggregate map-side and merge
  * across any shuffle tree — cross-snapshot / cross-stratum overlap
  * ("how much of today's crawl is yesterday's?") without ever joining
  * the raw key universes. The per-update cost is a binary search +
  * bounded insert (the last slot evicts), so a hot partition stays
  * O(n log k). */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a bigint column, got ${child.dataType.sql}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch k must be >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(s: java.util.TreeSet[Long], v: Long): Unit = {
    if (s.size < k) { s.add(v); () }
    else if (v < s.last && !s.contains(v)) {
      s.add(v)
      s.remove(s.last)
    }
  }

  override def update(s: java.util.TreeSet[Long], input: InternalRow)
      : java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(s, v.asInstanceOf[Long])
    s
  }

  override def merge(s: java.util.TreeSet[Long], other: java.util.TreeSet[Long])
      : java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(s, it.next())
    s
  }

  override def eval(s: java.util.TreeSet[Long]): Any = {
    val out = new Array[Any](s.size)
    val it = s.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(s: java.util.TreeSet[Long]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + 8 * s.size)
    out.putInt(s.size)
    val it = s.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val in = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[Long]()
    var n = in.getInt
    while (n > 0) { s.add(in.getLong); n -= 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}
