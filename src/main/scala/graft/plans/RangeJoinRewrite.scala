package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a fixed-width RANGE join into a bucketed
  * equi-join.
  *
  * The query every analyst writes first —
  *
  * {{{ a.join(b, b.ts >= a.start && b.ts <= date_add(a.start, k)) }}}
  *
  * — has no equi-key, so Spark plans a BroadcastNestedLoopJoin (or a
  * cartesian product): every (interval, point) pair is compared, O(n·m),
  * a non-starter at 100 TB. Range engines (DuckDB's IEJoin, Postgres
  * range indexes) special-case this shape; Spark leaves it to the user.
  * This rule gives the declared form the scalable shape automatically,
  * the Spark-first way — the same contract as [[SimilarityJoinRewrite]].
  *
  * Rewrite (exact, not heuristic): the interval width is the foldable
  * literal k, so bin the domain at width k. The POINT side computes one
  * bucket `⌊p/k⌋`; the INTERVAL side explodes to the two bins its span
  * can touch, `⌊lo/k⌋` and `⌊lo/k⌋ + 1` (a width-k interval can never
  * cross more than one bin boundary); the join becomes an equi-join on
  * the bin with the ORIGINAL predicate re-applied to every candidate.
  * Completeness: p ∈ [lo, lo+k] ⟹ ⌊lo/k⌋·k ≤ p < (⌊lo/k⌋+2)·k, so
  * ⌊p/k⌋ ∈ {⌊lo/k⌋, ⌊lo/k⌋+1}. The point side is never exploded and the
  * two interval bins are distinct, so every pair surfaces exactly once —
  * no dedup pass, multiplicity is the naive join's by construction.
  * Floor division is exact for ALL inputs (negatives included): pure
  * integral truncating-divide with a remainder-sign correction — no
  * double rounding, no overflow anywhere in the Long domain.
  *
  * Matched shapes: conjuncts `p ≥/> lo` and `p ≤/< hi` over the same
  * point expression, where hi is `date_add(lo, k)` (DateType p, k days),
  * `lo + INTERVAL …` (TimestampType p, day-time or months=days=0
  * calendar interval — exact microseconds; calendar DAYS are tz-aware
  * and not constant-width, so they bail), or `lo + k` (integral p), k a
  * foldable positive constant, p referencing exactly one join side and
  * lo exactly the other, and lo's type equal to p's (a mismatched pair
  * arrives wrapped in casts this rule does not see through). Strict
  * bounds rewrite too — the bin containment argument only uses the
  * inclusive hull. Inner BATCH joins with NO cross-side equality
  * conjunct only: an equi-key means Spark already plans a scalable
  * equi-join with the range as a filter (binning there just adds a 2×
  * interval-side explode and a redundant key), and on a streaming join
  * the added key would silently change the state-store layout and break
  * existing checkpoints — both bail. Disabled
  * with `spark.graft.rangeJoin.rewrite=false`; bucket attributes carry
  * the `__grj_` prefix, and a join already referencing one is skipped —
  * the fixed-point batch cannot re-match this rule's own output.
  *
  * At 100 TB: the bin is a plain shuffle key — co-partition both sides
  * on it (AQE handles skewed bins like any hot key). The k-vs-corpus
  * asymmetric case (tiny interval table) still broadcasts fine: the
  * rewritten join is an ordinary equi-join and every downstream
  * strategy applies.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoin.rewrite"

  private val BucketPrefix = "__grj_"

  /** (point, bound) for a lower-bound conjunct `point ≥/> bound`. */
  private object Lower {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case GreaterThan(p, lo)        => Some((p, lo))
      case LessThanOrEqual(lo, p)    => Some((p, lo))
      case LessThan(lo, p)           => Some((p, lo))
      case _ => None
    }
  }

  /** (point, hi) for an upper-bound conjunct `point ≤/< hi`. */
  private object Upper {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, hi)    => Some((p, hi))
      case LessThan(p, hi)           => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case GreaterThan(hi, p)        => Some((p, hi))
      case _ => None
    }
  }

  private def posIntLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) if v >= 1  => Some(v.toLong)
    case Literal(v: Long, LongType) if v >= 1L   => Some(v)
    case _ => None
  }

  /** Day-time interval literals carry exact microseconds (no months —
    * variable-length units never reach this type), so a timestamp upper
    * bound has a constant width. Calendar intervals qualify only when
    * both months and days are zero: TimestampAddInterval adds calendar
    * DAYS time-zone-aware, which is not constant-width across DST. */
  private def posMicrosLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _: DayTimeIntervalType) if v >= 1L => Some(v)
    case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval, CalendarIntervalType)
        if ci.months == 0 && ci.days == 0 && ci.microseconds >= 1L =>
      Some(ci.microseconds)
    case _ => None
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The analyzer leaves a no-op cast over interval additions
    * (`cast(ts + INTERVAL … as timestamp)`); see through it. */
  private def stripTrivialCast(e: Expression): Expression = e match {
    case c @ Cast(child, dt, _, _) if child.dataType == dt => stripTrivialCast(child)
    case other => other
  }

  /** hi decomposed as lo + k for the supported point types. */
  private def widthOf(hi0: Expression, lo: Expression,
                      pointType: DataType): Option[Long] = {
    val hi = stripTrivialCast(hi0)
    (hi, pointType) match {
      case (DateAdd(lo2, k), DateType) if lo2.semanticEquals(lo) => posIntLit(k)
      case (TimestampAddInterval(lo2, k, _), TimestampType)
          if lo2.semanticEquals(lo) => posMicrosLit(k)
      case (Add(lo2, k, _), dt) if isIntegral(dt) && lo2.semanticEquals(lo) => posIntLit(k)
      case (Add(k, lo2, _), dt) if isIntegral(dt) && lo2.semanticEquals(lo) => posIntLit(k)
      case _ => None
    }
  }

  /** The point/interval expressions normalized to LongType (exact: date
    * → epoch days, timestamp → epoch micros, integrals widen
    * losslessly). */
  private def toLong(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), LongType)
    case TimestampType => UnixMicros(e)
    case LongType => e
    case ByteType | ShortType | IntegerType => Cast(e, LongType)
    case other => throw new IllegalStateException(s"unexpected range type $other")
  }

  /** Exact ⌊x/k⌋ over longs, overflow-free for the full Long range:
    * truncating `x div k` corrected down by one when the remainder is
    * negative (Math.floorDiv's identity, k ≥ 1 here). The tempting
    * `(x − pmod(x, k)) div k` wraps for x within k of Long.MinValue —
    * the subtraction underflows before the divide — silently mis-binning
    * those points (or throwing under ANSI mode). div/rem themselves
    * cannot overflow for positive k, and the −1 correction only fires
    * when r < 0, which requires k ≥ 2 and |q| ≤ MaxValue/2. */
  private def floorBucket(x: Expression, k: Long): Expression = {
    val q = IntegralDivide(x, Literal(k))
    val r = Remainder(x, Literal(k))
    Subtract(q, If(LessThan(r, Literal(0L)), Literal(1L), Literal(0L)))
  }

  private def lowers(conjuncts: Seq[Expression]): Seq[(Expression, Expression)] =
    conjuncts.collect { case Lower(p, lo) => (p, lo) }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def onlyIn(e: Expression, p: LogicalPlan) =
          e.references.nonEmpty && e.references.subsetOf(p.outputSet)
        // Bail when the join is already scalable or the rewrite would be
        // unsafe: a cross-side EQUALITY conjunct means Spark plans an
        // equi-join with the range as a filter — binning there only adds
        // a 2× interval-side explode and a redundant key (and, for a
        // STREAMING join, silently changes the state-store key layout,
        // breaking existing checkpoints). This rule exists for the
        // range-ONLY joins stock Spark can only plan as products.
        val hasEqui = conjuncts.exists {
          case Equality(a, b) => // EqualTo and EqualNullSafe both plan as equi-keys
            (onlyIn(a, left) && onlyIn(b, right)) ||
            (onlyIn(b, left) && onlyIn(a, right))
          case _ => false
        }
        val matched =
          if (hasEqui || left.isStreaming || right.isStreaming) None
          else conjuncts.iterator.flatMap {
            case Upper(p, hi) =>
              lowers(conjuncts).filter(_._1.semanticEquals(p)).flatMap { case (_, lo) =>
                val oriented =
                  (onlyIn(p, left) && onlyIn(lo, right)) ||
                  (onlyIn(p, right) && onlyIn(lo, left))
                if (oriented && lo.dataType == p.dataType &&
                    (p.dataType == DateType || p.dataType == TimestampType ||
                      isIntegral(p.dataType)))
                  widthOf(hi, lo, p.dataType).map(k => (p, lo, k))
                else None
              }
            case _ => None
          }.toSeq.headOption
        matched match {
          case Some((p, lo, k)) => rewrite(j, cond, p, lo, k)
          case None => j
        }
    }
  }

  private def rewrite(j: Join, cond: Expression, p: Expression,
                      lo: Expression, k: Long): LogicalPlan = {
    val pointOnLeft = p.references.subsetOf(j.left.outputSet)
    val (pointSide, intervalSide) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
    // point side: one bucket column
    val pbAlias = Alias(floorBucket(toLong(p), k), s"${BucketPrefix}pb")()
    val pointPlan = Project(pointSide.output :+ pbAlias, pointSide)
    // interval side: base bin, exploded to {bin, bin+1}
    val ibBase = Alias(floorBucket(toLong(lo), k), s"${BucketPrefix}ib0")()
    val intervalProj = Project(intervalSide.output :+ ibBase, intervalSide)
    // nullable: a NULL interval bound yields NULL buckets (array(null,
    // null) → exploded null rows), which the bucket equi-join then drops —
    // exactly the naive join's null-comparison semantics. Declaring the
    // attribute non-nullable while nulls flow through it would let
    // codegen read garbage instead.
    val ibAttr = AttributeReference(s"${BucketPrefix}ib", LongType,
      nullable = lo.nullable)()
    val intervalPlan = Generate(
      Explode(CreateArray(Seq(ibBase.toAttribute,
        Add(ibBase.toAttribute, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ibAttr), child = intervalProj)
    val (newLeft, newRight) =
      if (pointOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
    val joined = Join(newLeft, newRight, Inner,
      // sides keep their original left/right positions, so the user's
      // broadcast/shuffle hints still point at the frames they named
      Some(And(EqualTo(pbAlias.toAttribute, ibAttr), cond)), j.hint)
    Project(j.output.map(_.asInstanceOf[NamedExpression]), joined)
  }
}
