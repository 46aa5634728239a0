package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.T

/** Clickstream sessionization and funnel analysis over the events table —
  * the event-log curation stages a training-data pipeline runs upstream of
  * any per-user corpus construction (session boundaries decide what counts
  * as one interaction trace; funnels decide which traces reach an outcome).
  * Both are declarative window/join plans: no per-user driver loops, no
  * collect, and every shuffle is keyed by user_id, so the plans scale with
  * the user count and stay skew-safe as long as no single user dominates
  * the log (the same discipline as q07/q16).
  */
object Sessions {

  /** Gap (seconds) that closes a session: two consecutive events of one
    * user more than 8 h apart belong to different sessions. */
  val SessionGapSeconds = 28800L

  /** Conversion window per funnel step: a step counts only within 24 h of
    * the previous step's first occurrence. */
  val FunnelWindowHours = 24

  /** q86 — gap-based sessionization: per user, order events by (ts,
    * event_id) and open a new session whenever the gap to the previous
    * event exceeds [[SessionGapSeconds]]; emit one row per session with
    * its event count, start, duration, purchase count, and value total.
    *
    * 100 TB shape: ONE shuffle — the (user_id) window partitioning — and
    * the lag flag + running sum share it (one WindowExec pass, two frame
    * specs); the session aggregate groups on a superset of the window key
    * so it rides the same partitioning without a second exchange. Gap and
    * duration arithmetic is on unix_micros (exact integers), never on
    * float epochs — the oracle computes the identical integers, so the
    * session split is bit-reproducible across engines. */
  def q86Sessionize(t: T): DataFrame = sessionize(t.events)

  /** The reusable sessionization core over (user_id, event_id, ts,
    * event_type, value) rows — public so specs drive hand-built logs
    * through the identical pipeline. */
  def sessionize(events: DataFrame,
                 gapSeconds: Long = SessionGapSeconds): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long").as("duration_s"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** q87 — strict ordered funnel signup → view → click → purchase: a user
    * advances to step k+1 on the FIRST step-k+1 event strictly after
    * their step-k timestamp and within [[FunnelWindowHours]] of it; the
    * output is one row per step with the surviving user count.
    *
    * 100 TB shape: each step is a filter + equi-join on user_id + min
    * aggregate; the per-step frames shrink monotonically (one row per
    * surviving user), so after step 1 every join's build side is
    * broadcast-sized under AQE and the only full-table work is the
    * per-step event_type filter riding the same scan. Timestamps compare
    * at microsecond precision (plain timestamp <, no float epochs). */
  def q87Funnel(t: T): DataFrame = funnel(t.events)

  /** The reusable funnel core — public so specs drive hand-built logs
    * through the identical pipeline. */
  def funnel(events: DataFrame,
             windowHours: Int = FunnelWindowHours): DataFrame = {
    val e = events.select(col("user_id"), col("ts"), col("event_type"))
    def step(prev: DataFrame, prevT: String, typ: String, outT: String): DataFrame =
      e.filter(col("event_type") === typ)
        .join(prev.select(col("user_id"), col(prevT)), Seq("user_id"))
        .filter(col("ts") > col(prevT) &&
          col("ts") <= col(prevT) + expr(s"INTERVAL $windowHours HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as(outT))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = step(s1, "t1", "view", "t2")
    val s3 = step(s2, "t2", "click", "t3")
    val s4 = step(s3, "t3", "purchase", "t4")
    Seq(("signup", s1), ("view", s2), ("click", s3), ("purchase", s4)).zipWithIndex
      .map { case ((typ, df), i) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step"), lit(typ).as("event_type"), col("users")) }
      .reduce(_ unionByName _)
      .orderBy("step")
  }
}
