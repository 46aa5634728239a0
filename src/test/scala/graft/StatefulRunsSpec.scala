package graft

import java.sql.Timestamp

import graft.streaming.StatefulRuns

/** q96 semantics: the flatMapGroupsWithState run detector on hand-built
  * logs (emission rules, in-batch ordering, withheld final run) plus full
  * stream/batch parity on a mixed corpus slice. */
class StatefulRunsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def log(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (u, e, t, typ) => (u, e, ts(t), typ) }
      .toDF("user_id", "event_id", "ts", "event_type")
  }

  private def collectRuns(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2).toString, r.getLong(3))).toList

  test("completed runs emit; the final open run per user is withheld") {
    val out = collectRuns(StatefulRuns.streamRuns(spark, log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (1L, 2L, "2024-01-01 00:01:00", "view"),
      (1L, 3L, "2024-01-01 00:02:00", "click"),
      (1L, 4L, "2024-01-01 00:03:00", "click"),
      (1L, 5L, "2024-01-01 00:04:00", "click"),
      (1L, 6L, "2024-01-01 00:05:00", "view"),     // open run — withheld
      (2L, 7L, "2024-01-01 00:00:00", "purchase"), // only run — withheld
      (2L, 8L, "2024-01-01 00:01:00", "purchase")))))
    assert(out == List(
      (1L, "view", "2024-01-01 00:00:00.0", 2L),
      (1L, "click", "2024-01-01 00:02:00.0", 3L)))
  }

  test("rows are processed in (ts, event_id) order, not arrival order") {
    // shuffled input: the run structure must follow event time
    val out = collectRuns(StatefulRuns.streamRuns(spark, log(Seq(
      (5L, 3L, "2024-03-01 10:02:00", "b"),
      (5L, 1L, "2024-03-01 10:00:00", "a"),
      (5L, 4L, "2024-03-01 10:03:00", "a"),
      (5L, 2L, "2024-03-01 10:01:00", "a")))))
    // time order: a a b a → runs [a,2], [b,1], open [a,1] withheld
    assert(out == List(
      (5L, "a", "2024-03-01 10:00:00.0", 2L),
      (5L, "b", "2024-03-01 10:02:00.0", 1L)))
  }

  test("same-timestamp events break ties by event_id") {
    val out = collectRuns(StatefulRuns.streamRuns(spark, log(Seq(
      (9L, 2L, "2024-05-05 12:00:00", "y"),
      (9L, 1L, "2024-05-05 12:00:00", "x"),
      (9L, 3L, "2024-05-05 12:01:00", "z")))))
    // id order at the tie: x y z → [x,1], [y,1], open [z,1] withheld
    assert(out == List(
      (9L, "x", "2024-05-05 12:00:00.0", 1L),
      (9L, "y", "2024-05-05 12:00:00.0", 1L)))
  }

  test("stream/batch parity on a corpus slice") {
    // read via Tables so ts arrives TIMESTAMP_LTZ (NTZ is rejected by
    // withWatermark — the q72 lesson pinned in TimestampNtzSpec)
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(org.apache.spark.sql.functions.col("event_id") % 4 === 1)
      .select("user_id", "event_id", "ts", "event_type")
    val streamed = collectRuns(StatefulRuns.streamRuns(spark, events))
    val batch = collectRuns(StatefulRuns.batchRuns(events))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
