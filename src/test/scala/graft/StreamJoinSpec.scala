package graft

import java.sql.Timestamp

import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._

/** q99 semantics: the streamed interval join emits exactly the pairs with
  * purchase_ts in (view_ts, view_ts + 2h] for the same user — strict lower
  * bound, inclusive upper bound, cross-user never — and matches the batch
  * join on the real corpus. */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def views(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.map { case (id, t, u) => (id, ts(t), u) }
      .toDF("view_id", "view_ts", "user_id")
  }

  private def purchases(rows: Seq[(Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.map { case (id, t, u, v) => (id, ts(t), u, v) }
      .toDF("purchase_id", "purchase_ts", "user_id", "value")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("view_id", "purchase_id", "gap_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList

  test("window boundaries: strict lower, inclusive 2h upper, cross-user excluded") {
    val v = views(Seq(
      (1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-01 18:00:00", 8L)))
    val p = purchases(Seq(
      (10L, "2024-01-01 10:00:00", 7L, 5.0),  // same instant: excluded (>)
      (11L, "2024-01-01 10:30:00", 7L, 6.0),  // inside
      (12L, "2024-01-01 12:00:00", 7L, 7.0),  // exactly +2h: included (<=)
      (13L, "2024-01-01 12:00:01", 7L, 8.0),  // past the window
      (14L, "2024-01-01 18:30:00", 9L, 9.0))) // other user
    val out = pairs(StreamJoin.streamIntervalJoin(spark, v, p))
    assert(out == List((1L, 11L, 1800L), (1L, 12L, 7200L)))
  }

  test("one view matching several purchases and vice versa emits every pair") {
    val v = views(Seq(
      (1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-01 10:15:00", 7L)))
    val p = purchases(Seq(
      (10L, "2024-01-01 10:30:00", 7L, 1.0),
      (11L, "2024-01-01 11:00:00", 7L, 2.0)))
    val out = pairs(StreamJoin.streamIntervalJoin(spark, v, p))
    assert(out == List((1L, 10L, 1800L), (1L, 11L, 3600L),
      (2L, 10L, 900L), (2L, 11L, 2700L)))
  }

  test("q106: stream-static enrichment equals the batch join") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val streamed = graft.streaming.StreamJoin.q106StreamEnrich(t).collect().toSeq
    val batch = t.events.filter(col("event_id") % 4 === 2)
      .join(t.customer, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_nationkey"),
        col("c_mktsegment"), round(col("value"), 2).as("value"))
      .orderBy("event_id").collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  // --- q102 tumbling-window flush boundary (same streaming family) ---

  test("q102: a window ending exactly at the watermark flushes; the open tail is withheld") {
    import spark.implicits._
    val log = Seq(
      (1L, "2024-01-01 00:00:30", "click", 1.0),
      (2L, "2024-01-01 05:59:59", "click", 2.0),
      (3L, "2024-01-01 06:00:00", "view", 4.0)) // max ts == window-1 end
      .map { case (id, t, e, v) => (id, ts(t), e, v) }
      .toDF("event_id", "ts", "event_type", "value")
    val out = graft.streaming.Incremental.streamWindowCounts(spark, log)
      .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getString(2), r.getLong(3), r.getDouble(4))).toList
    // [00:00, 06:00) end == watermark 06:00 → flushed; [06:00, 12:00) open
    assert(out == List(
      ("2024-01-01 00:00:00.0", "2024-01-01 06:00:00.0", "click", 2L, 3.0)))
  }

  test("stream/batch parity on the corpus") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val streamed = StreamJoin.q99StreamJoin(t)
    val v = t.events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id"))
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user_id"), col("value"))
    val batch = v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"),
        expr("(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000")
          .as("gap_s"),
        round(col("value"), 2).as("purchase_value"))
      .orderBy("view_id", "purchase_id")
    assert(streamed.schema == batch.schema)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
    assert(streamed.count() > 0)
  }
}
