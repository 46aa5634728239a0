package graft

import java.sql.Timestamp

import graft.streaming.Incremental

/** The q153 streaming SpaceSaving round-trip on a hand log: append-mode
  * flush boundary (win_end ≤ max event time), exactness below the k
  * bound (err = 0, counts equal plain aggregation), and the sketch's
  * (count DESC, item) rank order. */
class StreamingTopkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-0$day $hour%02d:00:00")

  // day 1: click×3, view×2, error×1; day 2: view×2, click×1 (tie with
  // error×1 broken lexicographically: click < error); day 3: one event
  // holding the watermark — its window stays open and is withheld.
  private val log = Seq(
    (1L, ts(1, 1), "click"), (2L, ts(1, 2), "click"), (3L, ts(1, 3), "view"),
    (4L, ts(1, 4), "click"), (5L, ts(1, 5), "view"), (6L, ts(1, 6), "error"),
    (7L, ts(2, 1), "view"), (8L, ts(2, 2), "click"), (9L, ts(2, 3), "view"),
    (10L, ts(2, 4), "error"),
    (11L, ts(3, 0), "click")
  ).toDF("event_id", "ts", "event_type")

  test("flush boundary, exact counts under the k bound, rank order and " +
    "tie-break") {
    val got = Incremental.streamWindowTopk(spark, log).collect()
      .map(r => (r.getTimestamp(0), r.getInt(3), r.getString(4),
        r.getLong(5), r.getLong(6), r.getLong(2)))
    val d1 = Timestamp.valueOf("2024-03-01 00:00:00")
    val d2 = Timestamp.valueOf("2024-03-02 00:00:00")
    // day 3's window is open (win_end > max ts) and must be withheld
    assert(got.map(_._1).distinct.toSet == Set(d1, d2))
    // exact, ordered, err = 0 — the under-k SpaceSaving contract
    assert(got.filter(_._1 == d1).toList == List(
      (d1, 1, "click", 3L, 0L, 6L),
      (d1, 2, "view", 2L, 0L, 6L),
      (d1, 3, "error", 1L, 0L, 6L)))
    assert(got.filter(_._1 == d2).toList == List(
      (d2, 1, "view", 2L, 0L, 4L),
      (d2, 2, "click", 1L, 0L, 4L),
      (d2, 3, "error", 1L, 0L, 4L)))
  }
}
