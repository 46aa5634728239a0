package graft

import java.sql.Timestamp

import graft.operators.Sessions
import org.apache.spark.sql.functions._

/** q86/q87 semantics on hand-built logs (the oracle pins the real corpus;
  * this pins the rules): gap-at-threshold inclusion, event_id tiebreak,
  * strictly-after and within-window funnel steps, step skipping. */
class SessionsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def log(rows: Seq[(Long, Long, String, String, Double)]) = {
    import spark.implicits._
    rows.map { case (u, e, t, typ, v) => (u, e, ts(t), typ, v) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
  }

  test("a gap of exactly gapSeconds stays in-session; one more second splits") {
    val out = Sessions.sessionize(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, 2L, "2024-01-01 08:00:00", "view", 2.0),       // gap == 8h → same
      (1L, 3L, "2024-01-01 16:00:01", "view", 3.0))),     // gap 8h+1s → new
      gapSeconds = 28800L)
      .select("user_id", "session_seq", "n_events", "duration_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(out == List((1L, 1L, 2L, 28800L), (1L, 2L, 1L, 0L)))
  }

  test("session stats: purchases counted, values summed, start is min ts") {
    val out = Sessions.sessionize(log(Seq(
      (7L, 1L, "2024-02-01 10:00:00", "view", 10.5),
      (7L, 2L, "2024-02-01 10:05:00", "purchase", 20.25),
      (7L, 3L, "2024-02-01 10:10:00", "purchase", 1.0))))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Timestamp]("session_start") == ts("2024-02-01 10:00:00"))
    assert(r.getAs[Long]("duration_s") == 600L)
    assert(r.getAs[Long]("n_purchases") == 2L)
    assert(r.getAs[Double]("total_value") == 31.75)
  }

  test("equal timestamps order by event_id for the session split") {
    // both orderings of the tie produce the same sessions only because the
    // event_id tiebreak is deterministic; the third event is 9h after the
    // tie, so it opens session 2 regardless
    val out = Sessions.sessionize(log(Seq(
      (2L, 20L, "2024-01-01 00:00:00", "view", 0.0),
      (2L, 10L, "2024-01-01 00:00:00", "click", 0.0),
      (2L, 30L, "2024-01-01 09:00:00", "view", 0.0))))
      .select("session_seq", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out == List((1L, 2L), (2L, 1L)))
  }

  test("users sessionize independently") {
    val out = Sessions.sessionize(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view", 0.0),
      (2L, 2L, "2024-01-01 00:00:30", "view", 0.0))))
      .select("user_id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L)))
  }

  test("funnel: full in-order conversion counts every step") {
    val out = Sessions.funnel(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "signup", 0.0),
      (1L, 2L, "2024-01-01 01:00:00", "view", 0.0),
      (1L, 3L, "2024-01-01 02:00:00", "click", 0.0),
      (1L, 4L, "2024-01-01 03:00:00", "purchase", 0.0))))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    assert(out == List((1, "signup", 1L), (2, "view", 1L),
      (3, "click", 1L), (4, "purchase", 1L)))
  }

  test("funnel: a step at the SAME instant as the previous does not advance") {
    val out = Sessions.funnel(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "signup", 0.0),
      (1L, 2L, "2024-01-01 00:00:00", "view", 0.0))))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toList
    assert(out == List((1, 1L), (2, 0L), (3, 0L), (4, 0L)))
  }

  test("funnel: outside the conversion window does not advance; boundary does") {
    val out = Sessions.funnel(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "signup", 0.0),
      (1L, 2L, "2024-01-02 00:00:00", "view", 0.0),       // == t1+24h → counts
      (1L, 3L, "2024-01-03 00:00:01", "click", 0.0),      // t2+24h+1s → out
      (2L, 4L, "2024-01-01 00:00:00", "signup", 0.0),
      (2L, 5L, "2024-01-02 00:00:01", "view", 0.0))))     // t1+24h+1s → out
      .collect().map(r => (r.getInt(0), r.getLong(2))).toList
    assert(out == List((1, 2L), (2, 1L), (3, 0L), (4, 0L)))
  }

  test("funnel: out-of-order steps do not advance (view before signup)") {
    val out = Sessions.funnel(log(Seq(
      (1L, 1L, "2024-01-01 05:00:00", "signup", 0.0),
      (1L, 2L, "2024-01-01 01:00:00", "view", 0.0))))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toList
    assert(out == List((1, 1L), (2, 0L), (3, 0L), (4, 0L)))
  }

  test("funnel: the FIRST qualifying event anchors the next window") {
    // user 1's first in-window view is at 23h; the click 25h after THAT
    // view is in ITS window, proving the anchor is min(qualifying ts) —
    // not the last or any later view
    val out = Sessions.funnel(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "signup", 0.0),
      (1L, 2L, "2024-01-01 23:00:00", "view", 0.0),
      (1L, 3L, "2024-01-01 23:30:00", "view", 0.0),
      (1L, 4L, "2024-01-02 22:00:00", "click", 0.0))))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toList
    assert(out == List((1, 1L), (2, 1L), (3, 1L), (4, 0L)))
  }
}
