package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, CoalescedHashPartitioning, Distribution, HashPartitioning, Partitioning, PartitioningCollection, SinglePartition}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A native AS-OF JOIN operator — the full custom-operator path the brief
  * reserves for semantics the built-ins can't express AS A SINGLE NODE:
  * logical plan node + planner strategy (registered through
  * `SparkSessionExtensions.injectPlannerStrategy`) + physical sort-merge
  * execution. Spark has no public as-of join in the DataFrame/SQL API;
  * the compositional route is the union + running-last window (q89).
  * This node states the intent — "for each left row, the latest right
  * row with the same key strictly before it" — and the engine plans it
  * like a first-class join.
  *
  * Physical shape (declared via the standard operator contracts, so
  * EnsureRequirements supplies the movement): both children are
  * hash-clustered on the key (`requiredChildDistribution`, one shuffle
  * per side exactly like a SortMergeJoin) and sorted within partitions —
  * left by (key, time), right by (key, time, tiebreak)
  * (`requiredChildOrdering`). Execution is then ONE forward merge pass
  * per co-partition: the right cursor never rewinds, state is a single
  * buffered row (the latest qualifying right row for the current key) —
  * O(1) memory per partition regardless of how many right rows precede a
  * left row, which is precisely what the window composition cannot
  * promise (its frame is logically unbounded-preceding).
  *
  * Semantics: for every left row L, the right row R with R.key == L.key
  * and R.time < L.time (STRICT — a same-instant right row never
  * matches) maximizing (R.time, R.tiebreak); all right columns are
  * carried, null when no such row exists. Rows with a null key or time
  * on either side never match. Keys are LongType and times
  * TimestampType (microsecond longs), checked at construction — the
  * merge compares primitives, no ordering allocation per row.
  */
/** User-facing constructor for the native as-of join. */
object AsOf {
  import org.apache.spark.sql.{DataFrame, GraftSqlShim}
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.{LongType, TimestampType}

  /** Left rows keep all columns; every right column is carried, null
    * when no strictly-earlier right row exists. Right columns are
    * re-aliased internally (fresh expression ids), so self-joins of the
    * same table are unambiguous — callers must still pick right-side
    * column NAMES distinct from the left's to address the output. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTiebreak: String): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"as-of join: rename right columns $dup — " +
      "output carries both sides by name")
    // Fresh exprIds on the right side so a self-join (both frames built
    // from the same cached table plan) stays unambiguous.
    val rFresh = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of join: no column `$n` on the $side side"))
    def checked(a: Attribute, t: org.apache.spark.sql.types.DataType): Attribute = {
      require(a.dataType == t,
        s"as-of join: `${a.name}` must be $t, got ${a.dataType}")
      a
    }
    GraftSqlShim.ofRows(left.sparkSession, AsOfJoin(lp, rp,
      checked(attr(lp, leftKey, "left"), LongType),
      checked(attr(rp, rightKey, "right"), LongType),
      checked(attr(lp, leftTime, "left"), TimestampType),
      checked(attr(rp, rightTime, "right"), TimestampType),
      checked(attr(rp, rightTiebreak, "right"), LongType)))
  }
}

case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Attribute, rightKey: Attribute,
                    leftTime: Attribute, rightTime: Attribute,
                    rightTiebreak: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in [[graft.GraftExtensions]]. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightTiebreak: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
        SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join: key/time attributes must come from the respective child")
    val rArity = right.output.size
    // Hoisted off the plan so the partition closure serializes attribute
    // lists, not the operator tree. The projection binds against the
    // NULLABLE output attrs — binding against right.output verbatim would
    // inherit a non-nullable child schema and compile away the null
    // checks the matchless rows need.
    val outAttrs = output
    // zipPartitions pairs partitions BY INDEX, so equal counts are not
    // enough: both children must be hash-partitioned by the same function
    // on exactly the join key (a RangePartitioning also satisfies
    // ClusteredDistribution but maps rows differently — silent row loss).
    // Accept the three shapes EnsureRequirements can legally deliver —
    // plain hash, AQE-coalesced hash with identical boundaries, single —
    // including any of them wrapped in a PartitioningCollection (a child
    // that is itself a join on the key advertises one; its rows ARE
    // hash-placed by the member partitioning, so unwrap and accept).
    def hashOnKey(exprs: Seq[Expression], key: Attribute): Boolean =
      exprs.length == 1 && exprs.head.semanticEquals(key)
    def shapeOf(p: Partitioning, key: Attribute): Option[(String, Int, Seq[Any])] =
      p match {
        case SinglePartition => Some(("single", 1, Nil))
        case HashPartitioning(e, n) if hashOnKey(e, key) =>
          Some(("hash", n, Nil))
        case CoalescedHashPartitioning(HashPartitioning(e, n), b)
            if hashOnKey(e, key) =>
          Some(("coalesced", n, b))
        case pc: PartitioningCollection =>
          pc.partitionings.iterator.map(shapeOf(_, key))
            .collectFirst { case Some(s) => s }
        case _ => None
      }
    (shapeOf(left.outputPartitioning, leftKey),
      shapeOf(right.outputPartitioning, rightKey)) match {
      case (Some(ls), Some(rs)) if ls == rs => ()
      case (ls, rs) =>
        throw new IllegalStateException(
          "as-of join: children must be hash-co-partitioned on the join " +
            s"keys; got ${left.outputPartitioning} vs " +
            s"${right.outputPartitioning} (accepted shapes: $ls vs $rs)")
    }
    val lRdd = left.execute(); val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join: children not co-partitioned " +
        s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions})")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // Physical operators must emit UnsafeRow (collect/shuffle cast to
        // it); project the JoinedRow like the built-in joins do. Created
        // per partition — generated projections don't serialize.
        private val proj = UnsafeProjection.create(outAttrs, outAttrs)
        private val nullRight = new GenericInternalRow(rArity)
        private var rNext: InternalRow = advance()
        // The latest qualifying right row for `matchKey` — the single
        // buffered row that replaces the window composition's frame.
        private var matchRow: InternalRow = null
        private var matchKey: Long = 0L
        private var hasMatch = false
        private def advance(): InternalRow =
          if (rIter.hasNext) rIter.next() else null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTimeIdx))
            return proj(joined(l, nullRight))
          val lk = l.getLong(lKeyIdx)
          val lt = l.getLong(lTimeIdx)
          var scanning = true
          while (scanning && rNext != null) {
            if (rNext.isNullAt(rKeyIdx) || rNext.isNullAt(rTimeIdx)) {
              rNext = advance() // null key/time never matches anything
            } else {
              val rk = rNext.getLong(rKeyIdx)
              if (rk < lk) {
                // Left is (key, time)-ascending: no later left row has a
                // smaller key, so this right row is dead — drop it.
                rNext = advance()
              } else if (rk == lk && rNext.getLong(rTimeIdx) < lt) {
                // Qualifies for this (and possibly later) left rows;
                // right is (time, tiebreak)-ascending so LAST seen wins.
                matchRow = rNext.copy()
                matchKey = rk
                hasMatch = true
                rNext = advance()
              } else scanning = false // right cursor is ahead — stop
            }
          }
          if (hasMatch && matchKey == lk) proj(joined(l, matchRow))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}
