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

  test("session_window: exactly-gap-apart events merge (closed interval, same as q86)") {
    val rows = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, 2L, "2024-01-01 08:00:00", "view", 2.0),
      (1L, 3L, "2024-01-01 16:00:01", "view", 3.0)) // 8h+1s → splits
    val native = Sessions.sessionWindow(log(rows))
      .select("session_start", "session_end", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toList
    assert(native == List(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 16:00:00"), 2L),
      (ts("2024-01-01 16:00:01"), ts("2024-01-02 00:00:01"), 1L)))
    // q86 splits on the identical > gap rule — same session membership
    val gapped = Sessions.sessionize(log(rows))
      .select("n_events").collect().map(_.getLong(0)).toList
    assert(gapped == List(2L, 1L))
  }

  test("session_window: sub-gap events merge and end extends from the last event") {
    val out = Sessions.sessionWindow(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, 2L, "2024-01-01 07:00:00", "purchase", 2.5),
      (1L, 3L, "2024-01-01 14:00:00", "view", 0.5)))) // chains via event 2
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Timestamp]("session_start") == ts("2024-01-01 00:00:00"))
    assert(r.getAs[Timestamp]("session_end") == ts("2024-01-01 22:00:00"))
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Double]("total_value") == 4.0)
  }

  test("session_window: the same query shape runs as a streaming aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sesswin").toString
    try {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/e.json"),
      """{"user_id":1,"event_id":1,"ts":"2024-01-01T00:00:00.000Z","event_type":"view","value":1.0}
        |{"user_id":1,"event_id":2,"ts":"2024-01-01T02:00:00.000Z","event_type":"view","value":2.0}
        |{"user_id":1,"event_id":3,"ts":"2024-01-01T15:00:00.000Z","event_type":"view","value":4.0}
        |{"user_id":2,"event_id":4,"ts":"2024-01-01T00:30:00.000Z","event_type":"purchase","value":8.0}""".stripMargin)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).json(dir)
    val q = Sessions.sessionWindow(stream.withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("sesswin").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql(
      "SELECT user_id, session_start, n_events, total_value FROM sesswin ORDER BY user_id, session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toList
    val batch = Sessions.sessionWindow(spark.read.schema(schema).json(dir))
      .select("user_id", "session_start", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toList
    assert(streamed == batch)
    assert(streamed.map(x => (x._1, x._3)) == List((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("streaming sessions: append mode withholds the session still inside the watermark") {
    // sessions whose end (last event + 8h) precedes the stream max are
    // flushed — user 1's, and user 2's FIRST (the 12h gap splits them);
    // user 2's second session ends 8h past the final watermark (its event
    // IS the stream max) → withheld in state at termination
    val out = graft.streaming.Incremental.streamSessions(spark, log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, 2L, "2024-01-01 01:00:00", "view", 2.0),
      (2L, 3L, "2024-01-02 00:00:00", "view", 4.0),
      (2L, 4L, "2024-01-02 12:00:00", "purchase", 8.0))))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4))).toList
    assert(out == List(
      (1L, ts("2024-01-01 00:00:00"), 2L, 3.0),
      (2L, ts("2024-01-02 00:00:00"), 1L, 4.0)))
  }

  test("as-of: each purchase picks the most recent strictly-earlier view") {
    val out = Sessions.asofViewBeforePurchase(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view", 10.0),
      (1L, 2L, "2024-01-01 01:00:00", "view", 20.0),
      (1L, 3L, "2024-01-01 02:00:00", "purchase", 99.0),
      (1L, 4L, "2024-01-01 03:00:00", "view", 30.0),
      (1L, 5L, "2024-01-01 04:00:00", "purchase", 77.0))))
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.get(4))).toList
    assert(out == List((3L, 99.0, 20.0), (5L, 77.0, 30.0)))
  }

  test("as-of: a same-instant view does not match; no prior view is null") {
    val out = Sessions.asofViewBeforePurchase(log(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "purchase", 5.0),   // nothing prior
      (1L, 2L, "2024-01-01 01:00:00", "view", 42.0),
      (1L, 3L, "2024-01-01 01:00:00", "purchase", 6.0), // tie: view excluded...
      (1L, 4L, "2024-01-01 02:00:00", "purchase", 7.0), // ...but visible later
      (2L, 5L, "2024-01-01 00:00:00", "click", 1.0),    // other types ignored
      (2L, 6L, "2024-01-01 00:30:00", "purchase", 8.0))))
      .collect().map(r => (r.getLong(1), r.get(4))).toList
    assert(out == List((1L, null), (3L, null), (4L, 42.0), (6L, null)))
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

  test("q163 cohort retention: hand-computed matrix, zero cells emitted, " +
    "cohort by FIRST signup, same-day purchases dedup per user") {
    // cohort 01-01: users 1, 2 (user 1 signs up twice — first wins).
    // cohort 01-02: user 3.
    // purchases: u1 on day0 (twice — distinct day counts once) and
    // day1; u2 on day1; u3 never.
    val out = Sessions.cohortRetention(log(Seq(
      (1L, 1L, "2024-01-01 01:00:00", "signup", 0.0),
      (1L, 2L, "2024-01-03 01:00:00", "signup", 0.0), // later signup inert
      (2L, 3L, "2024-01-01 02:00:00", "signup", 0.0),
      (3L, 4L, "2024-01-02 03:00:00", "signup", 0.0),
      (1L, 5L, "2024-01-01 10:00:00", "purchase", 1.0),
      (1L, 6L, "2024-01-01 11:00:00", "purchase", 1.0), // same day, dedup
      (1L, 7L, "2024-01-02 09:00:00", "purchase", 1.0),
      (2L, 8L, "2024-01-02 09:30:00", "purchase", 1.0),
      (9L, 9L, "2023-12-31 09:00:00", "purchase", 1.0))), // no signup: out
      horizon = 2)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toList
    assert(out == List(
      ("2024-01-01", 0, 2L, 1L, 500L),  // u1 bought day0
      ("2024-01-01", 1, 2L, 2L, 1000L), // u1 AND u2 bought day1
      ("2024-01-01", 2, 2L, 0L, 0L),    // zero cell emitted
      ("2024-01-02", 0, 1L, 0L, 0L),
      ("2024-01-02", 1, 1L, 0L, 0L),
      ("2024-01-02", 2, 1L, 0L, 0L)))
  }

  private def assertBucketedMatches(df: org.apache.spark.sql.DataFrame,
                                    gap: Long, bucketHours: Int): Unit = {
    val a = Sessions.sessionize(df, gap)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Sessions.sessionizeBucketed(df, gap, bucketHours)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == b.length, s"${a.length} vs ${b.length} sessions")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("bucketed sessionize: stitches sessions spanning bucket boundaries") {
    // one session crossing THREE day buckets via sub-gap hops near
    // midnight, a second session opened by a gap just over threshold,
    // and a second user entirely inside one bucket
    assertBucketedMatches(log(Seq(
      (1L, 1L, "2024-01-01 20:00:00", "view", 1.0),
      (1L, 2L, "2024-01-02 03:00:00", "purchase", 2.0), // 7h hop over midnight
      (1L, 3L, "2024-01-02 23:30:00", "view", 3.0),     // new session (>8h)
      (1L, 4L, "2024-01-03 00:30:00", "view", 4.0),     // stitches to e3
      (1L, 5L, "2024-01-03 08:30:00", "purchase", 5.0), // 8h exactly → same
      (2L, 6L, "2024-01-01 10:00:00", "view", 6.0))),
      gap = 28800L, bucketHours = 24)
  }

  test("bucketed sessionize: empty buckets between events do not stitch") {
    assertBucketedMatches(log(Seq(
      (5L, 1L, "2024-01-01 06:00:00", "view", 1.0),
      (5L, 2L, "2024-01-04 06:00:00", "view", 2.0))),   // 3 days apart
      gap = 28800L, bucketHours = 24)
  }

  test("bucketed sessionize matches plain sessionize on the real corpus") {
    assertBucketedMatches(
      Tables.T(spark, "/root/testdata/sf0.001").events
        .select("user_id", "event_id", "ts", "event_type", "value"),
      gap = Sessions.SessionGapSeconds, bucketHours = 24)
  }

  test("bucketed sessionize: randomized equivalence across gaps/widths") {
    // seeded random logs sweeping the parameter space: short/long gaps,
    // fine/coarse buckets, timestamps dense enough that sessions
    // regularly straddle bucket edges and sparse enough that empty
    // buckets appear — every (gap, width) pair must reproduce plain
    // sessionize exactly
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    for (round <- 1 to 10) {
      val gap = Seq(3600L, 28800L, 90000L)(rnd.nextInt(3))
      val bucketH = Seq(24, 72, 168)(rnd.nextInt(3))
      val rows = (1 to 60).map { i =>
        val u = 1L + rnd.nextInt(4)
        val t = new Timestamp(1704067200000L + // 2024-01-01
          rnd.nextInt(12 * 24 * 3600) * 1000L)
        (u, i.toLong, t, if (rnd.nextBoolean()) "view" else "purchase",
          math.round(rnd.nextDouble() * 10000) / 100.0)
      }
      val df = rows.toDF("user_id", "event_id", "ts", "event_type", "value")
      withClue(s"round $round gap=$gap bucketH=$bucketH: ") {
        assertBucketedMatches(df, gap, bucketH)
      }
    }
  }
}
