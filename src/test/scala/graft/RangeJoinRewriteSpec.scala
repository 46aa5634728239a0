package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** The range-join optimizer rule: exactness vs the naive nested-loop
  * plan, plan shape (no product join after rewrite), boundary
  * inclusivity, negative-domain bucketing, multiplicity, strict/reversed
  * comparison forms, and the opt-out conf. */
class RangeJoinRewriteSpec extends SparkSpec {

  private val EnabledKey = graft.plans.RangeJoinRewrite.EnabledKey

  private def withRule[A](on: Boolean)(body: => A): A =
    try { spark.conf.set(EnabledKey, on.toString); body }
    finally spark.conf.unset(EnabledKey)

  private def points(vs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    vs.toDF("p_id", "p")
  }

  private def intervals(vs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    vs.toDF("i_id", "lo")
  }

  private def naive(ps: DataFrame, is: DataFrame, k: Int): DataFrame =
    is.join(ps, col("p") >= col("lo") && col("p") <= col("lo") + lit(k))
      .select("i_id", "p_id", "p", "lo")

  private def pairs(df: DataFrame) =
    df.select("i_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted

  private def productJoins(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case _: BroadcastNestedLoopJoinExec => 1
      case _: CartesianProductExec => 1
    }.sum

  test("rewritten result equals the naive nested-loop result on random data") {
    val rnd = new scala.util.Random(123)
    val ps = points((1L to 400L).map(i => (i, rnd.nextLong() % 1000)))
    val is = intervals((1L to 100L).map(i => (i, rnd.nextLong() % 1000)))
    for (k <- Seq(1, 7, 100)) {
      val expected = withRule(on = false)(pairs(naive(ps, is, k)))
      val got = withRule(on = true)(pairs(naive(ps, is, k)))
      assert(expected.nonEmpty, s"k=$k corpus produced no pairs")
      assert(got == expected, s"k=$k")
    }
  }

  test("the rewrite removes the product join; disabling restores it") {
    val ps = points(Seq((1L, 5L)))
    val is = intervals(Seq((1L, 3L)))
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec whose collect() does not descend
    val on = withRule(on = true)(naive(ps, is, 7).queryExecution.sparkPlan)
    val off = withRule(on = false)(naive(ps, is, 7).queryExecution.sparkPlan)
    assert(productJoins(on) == 0, on.toString)
    assert(productJoins(off) > 0, off.toString)
  }

  test("boundaries are inclusive on both ends, exclusive outside") {
    val is = intervals(Seq((1L, 10L)))
    val ps = points(Seq((1L, 9L), (2L, 10L), (3L, 13L), (4L, 15L), (5L, 16L)))
    val got = withRule(on = true)(pairs(naive(ps, is, 5)))
    assert(got == List((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("negative domains bucket exactly (floor, not truncate-toward-zero)") {
    // straddles zero: lo = −3, k = 5 → window [−3, 2]; a truncating
    // division would put −3 and 2 in the same bucket 0 and, worse, put
    // lo = −8 (bucket −1 under floor) at bucket −1 vs point −4 at 0
    val is = intervals(Seq((1L, -3L), (2L, -8L)))
    val ps = points((-10L to 5L).map(v => (v + 100L, v)))
    val expected = withRule(on = false)(pairs(naive(ps, is, 5)))
    val got = withRule(on = true)(pairs(naive(ps, is, 5)))
    assert(got == expected)
    // sanity: the full windows matched
    assert(got.count(_._1 == 1L) == 6 && got.count(_._1 == 2L) == 6)
  }

  test("points within k of Long.MinValue/MaxValue bucket without overflow") {
    // the pre-r12-review floorBucket built (x − pmod(x, k)) div k, whose
    // subtraction wraps for x within k of Long.MinValue: lo = MinValue
    // binned via the wrapped value while p = MinValue + 5 binned without
    // wrap, so the bucket equi-join silently dropped the matching pair
    val min = Long.MinValue
    val max = Long.MaxValue
    val is = intervals(Seq((1L, min), (2L, max - 5L)))
    val ps = points(Seq((1L, min), (2L, min + 5L), (3L, min + 6L),
      (4L, max - 5L), (5L, max)))
    val expected = withRule(on = false)(pairs(naive(ps, is, 5)))
    val got = withRule(on = true)(pairs(naive(ps, is, 5)))
    assert(got == expected)
    assert(got == List((1L, 1L), (1L, 2L), (2L, 4L), (2L, 5L)), got.toString)
  }

  test("duplicate rows keep their multiplicity") {
    val is = intervals(Seq((1L, 0L), (1L, 0L)))
    val ps = points(Seq((7L, 2L), (7L, 2L)))
    val got = withRule(on = true)(pairs(naive(ps, is, 3)))
    assert(got == List((1L, 7L), (1L, 7L), (1L, 7L), (1L, 7L)))
  }

  test("strict and reversed comparison forms rewrite too") {
    val is = intervals(Seq((1L, 10L)))
    val ps = points(Seq((1L, 10L), (2L, 12L), (3L, 15L)))
    for ((cond, expected) <- Seq(
        (col("p") > col("lo") && col("p") <= col("lo") + lit(5),
          List((1L, 2L), (1L, 3L))),
        (col("lo") <= col("p") && col("lo") + lit(5) > col("p"),
          List((1L, 1L), (1L, 2L))))) {
      val j = is.join(ps, cond).select("i_id", "p_id")
      val plan = withRule(on = true)(j.queryExecution.sparkPlan)
      assert(productJoins(plan) == 0, plan.toString)
      val got = withRule(on = true)(
        j.collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted)
      assert(got == expected, cond.toString)
    }
  }

  test("date intervals: the declared q123 plans no product join and the width matters") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val df = graft.operators.Sessions.q123RangeJoin(t)
    assert(productJoins(df.queryExecution.sparkPlan) == 0,
      df.queryExecution.sparkPlan.toString)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every window holds at least its own count ≥ 1 and the 3-day cap is
    // plausible: no count can exceed the total R-flag lineitems
    assert(rows.forall(_.getLong(2) >= 1L))
  }

  test("timestamp intervals rewrite: q124 plans no product join, equals naive") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val df = graft.operators.Sessions.q124TsRangeJoin(t)
    assert(productJoins(df.queryExecution.sparkPlan) == 0,
      df.queryExecution.sparkPlan.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toList
    val naive = withRule(on = false) {
      val n = graft.operators.Sessions.q124TsRangeJoin(t)
      assert(productJoins(n.queryExecution.sparkPlan) > 0, "naive plan not BNLJ?")
      n.collect().map(r => (r.getLong(0), r.getLong(2))).toList
    }
    assert(got.nonEmpty)
    assert(got == naive)
  }

  test("calendar DAY intervals do not rewrite (tz-variable width)") {
    import spark.implicits._
    val is = Seq(("2024-01-01 00:00:00")).toDF("lo0")
      .select(col("lo0").cast("timestamp").as("lo"))
    val ps = Seq(("2024-01-01 12:00:00")).toDF("p0")
      .select(col("p0").cast("timestamp").as("p"))
    val j = is.join(ps, col("p") >= col("lo") &&
      col("p") <= col("lo") + expr("INTERVAL '1' DAY"))
    // DAY may parse as a day-time interval (exact 86400s micros —
    // rewrites) or a calendar interval (bails); either way the result
    // must match the naive plan
    val got = withRule(on = true)(j.count())
    val naive = withRule(on = false)(j.count())
    assert(got == naive && got == 1L)
  }

  test("joins that already carry a cross-side equi key are left alone") {
    import spark.implicits._
    // q87's shape: equi on user + a fixed-width time window. Spark plans
    // this as an equi-join with the range as a filter — already scalable;
    // binning would only add a 2x interval-side explode (r12 review)
    val is = Seq((1L, "u1", 10L), (2L, "u2", 0L)).toDF("i_id", "u", "lo")
    val ps = Seq((1L, "u1", 12L), (2L, "u2", 90L)).toDF("p_id", "pu", "p")
    val j = is.join(ps, col("u") === col("pu") &&
      col("p") >= col("lo") && col("p") <= col("lo") + lit(5))
    val plan = withRule(on = true)(j.queryExecution.optimizedPlan.toString)
    assert(!plan.contains("__grj_"), plan)
    assert(withRule(on = true)(j.count()) == 1L)
    // null-safe equality is an equi-key too (r12 review: EqualNullSafe
    // also plans as a hash-join key, so binning is equally redundant)
    val jns = is.join(ps, col("u") <=> col("pu") &&
      col("p") >= col("lo") && col("p") <= col("lo") + lit(5))
    val planNs = withRule(on = true)(jns.queryExecution.optimizedPlan.toString)
    assert(!planNs.contains("__grj_"), planNs)
    assert(withRule(on = true)(jns.count()) == 1L)
  }

  test("streaming joins are left alone (state-store layout must not change)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s1 = MemoryStream[(Long, Long)].toDF()
      .select(col("_1").as("i_id"), col("_2").as("lo"))
    val s2 = MemoryStream[(Long, Long)].toDF()
      .select(col("_1").as("p_id"), col("_2").as("p"))
    val j = s1.join(s2, col("p") >= col("lo") && col("p") <= col("lo") + lit(5))
    // a streaming query's optimized plan only exists per micro-batch —
    // apply the rule directly to the analyzed plan instead
    val analyzed = j.queryExecution.analyzed
    val rewritten = graft.plans.RangeJoinRewrite(analyzed)
    assert(rewritten.fastEquals(analyzed), rewritten.toString)
  }

  test("null points and null bounds drop rows exactly like the naive join") {
    import spark.implicits._
    val is = Seq((1L, java.lang.Long.valueOf(10L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("i_id", "lo")
    val ps = Seq((1L, java.lang.Long.valueOf(12L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("p_id", "p")
    val j = is.join(ps, col("p") >= col("lo") && col("p") <= col("lo") + lit(5))
      .select("i_id", "p_id")
    val got = withRule(on = true)(
      j.collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted)
    val naive = withRule(on = false)(
      j.collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted)
    assert(got == naive && got == List((1L, 1L)))
  }

  test("unmatched shapes are left alone (no equi-bound, variable width)") {
    val is = intervals(Seq((1L, 1L)))
    val ps = points(Seq((1L, 2L)))
    // upper bound not lo + literal: lo + lo — must stay a product join
    // (window [1, 2] so the single pair still matches)
    val j = is.join(ps, col("p") >= col("lo") && col("p") <= col("lo") + col("lo"))
    val plan = withRule(on = true)(j.queryExecution.sparkPlan)
    assert(productJoins(plan) > 0)
    assert(j.count() == 1L)
  }
}
