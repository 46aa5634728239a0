package graft

import java.sql.Timestamp

import graft.plans.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native as-of operator (q108): plan shape (AsOfJoinExec, one
  * shuffle per side), strict-inequality and tiebreak semantics on crafted
  * boundaries, null carry for matchless rows, and full parity with an
  * argmax window replay on random corpora with deliberate ties — across
  * the test session's 4-partition shuffles. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def lefts(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.map { case (u, id, t) => (u, id, ts(t)) }.toDF("user_id", "event_id", "ts")

  private def rights(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    rows.map { case (u, id, t, v) => (u, id, ts(t), v) }
      .toDF("v_user_id", "v_event_id", "v_ts", "v_value")

  private def asof(l: DataFrame, r: DataFrame): DataFrame =
    AsOf.join(l, r, "user_id", "v_user_id", "ts", "v_ts", "v_event_id")

  test("plans as AsOfJoinExec with one exchange per side") {
    val l = lefts(Seq((1L, 1L, "2024-01-01 10:00:00")))
    val r = rights(Seq((1L, 10L, "2024-01-01 09:00:00", 1.0)))
    val plan = asof(l, r).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // AsOfJoinExec prints sans Exec
    assert(graft.operators.ScaleTechniques.shuffleCount(asof(l, r)) == 2)
  }

  test("direct collect with no projection on top returns UnsafeRow output") {
    val l = lefts(Seq((1L, 1L, "2024-01-01 10:00:00")))
    val r = rights(Seq((1L, 10L, "2024-01-01 09:00:00", 1.5)))
    // no select/orderBy between the operator and the action
    val rows = asof(l, r).collect()
    assert(rows.length == 1 && rows.head.getDouble(6) == 1.5)
  }

  test("strict inequality, latest-wins, and the event_id tiebreak") {
    val l = lefts(Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (1L, 2L, "2024-01-01 12:00:00"),
      (2L, 3L, "2024-01-01 10:00:00")))
    val r = rights(Seq(
      (1L, 10L, "2024-01-01 09:00:00", 1.0),
      (1L, 12L, "2024-01-01 09:30:00", 2.0), // tie on ts with 11:
      (1L, 11L, "2024-01-01 09:30:00", 3.0), //   larger id (12) wins
      (1L, 13L, "2024-01-01 10:00:00", 4.0), // same instant as left 1: no
      (1L, 14L, "2024-01-01 11:00:00", 5.0), // matches only left 2
      (2L, 15L, "2024-01-01 11:00:00", 6.0))) // after user 2's purchase
    val out = asof(l, r)
      .select("event_id", "v_event_id", "v_value")
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) -1.0 else x.getDouble(2))).toList
    assert(out == List(
      (1L, 12L, 2.0),  // 09:30 tie → id 12; 10:00 view excluded (strict)
      (2L, 14L, 5.0),  // latest earlier view
      (3L, -1L, -1.0))) // user 2 has no earlier view → nulls
  }

  test("range-partitioned children fail loudly instead of misaligning") {
    // RangePartitioning satisfies ClusteredDistribution, so a child that
    // arrives already range-partitioned on the key would pass
    // EnsureRequirements without a re-shuffle — but zipPartitions pairs
    // partitions by index and range≠hash maps rows differently. The exec
    // must refuse, not drop matches. Build the physical node by hand
    // (bypassing the planner, as a library caller embedding the operator
    // could) over two range-shuffled children.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = lefts((1L to 50L).map(i => (i % 7, i, "2024-01-01 10:00:00")))
        .repartitionByRange(4, col("user_id"))
      val r = rights((1L to 50L).map(i => (i % 7, 1000L + i, "2024-01-01 09:00:00", 1.0)))
        .repartitionByRange(4, col("v_user_id"))
      val lp = l.queryExecution.executedPlan
      val rp = r.queryExecution.executedPlan
      def a(p: org.apache.spark.sql.execution.SparkPlan, n: String) =
        p.output.find(_.name == n).get
      val exec = graft.plans.AsOfJoinExec(lp, rp,
        a(lp, "user_id"), a(rp, "v_user_id"),
        a(lp, "ts"), a(rp, "v_ts"), a(rp, "v_event_id"))
      val e = intercept[IllegalStateException](exec.execute())
      assert(e.getMessage.contains("hash-co-partitioned"), e.getMessage)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("random corpora with ties: parity with the argmax window replay") {
    val rnd = new scala.util.Random(108)
    // coarse timestamps force plenty of exact ties; 40 users spread the
    // 4 test shuffle partitions
    def randTs() = f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(4) * 15}%02d:00"
    val l = lefts((1L to 300L).map(i => (rnd.nextInt(40).toLong, i, randTs())))
    val r = rights((1L to 400L).map(i =>
      (rnd.nextInt(40).toLong, 1000L + i, randTs(), rnd.nextInt(100) / 10.0)))
    val native = asof(l, r)
      .select("event_id", "v_event_id", "v_value")
      .orderBy("event_id").collect().toSeq
    val cand = l.join(r, col("user_id") === col("v_user_id") && col("v_ts") < col("ts"), "left")
    val w = Window.partitionBy("event_id").orderBy(col("v_ts").desc, col("v_event_id").desc)
    val replay = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || col("v_event_id").isNull)
      .select("event_id", "v_event_id", "v_value")
      .orderBy("event_id").collect().toSeq
    assert(native == replay && native.nonEmpty)
  }
}
