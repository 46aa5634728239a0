package graft

import java.sql.Timestamp

import graft.streaming.Incremental
import org.apache.spark.sql.functions._

/** The q140 streaming-quantile round-trip on a hand log: append-mode
  * flush boundary, cell parity between the streaming sketch state and
  * the plain batch aggregate, mass == row count, and the est/exact
  * geometry bound on every flushed window. */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-02-0$day $hour%02d:00:00")

  // day 1: values spanning the exact region (< 32 cents) and two
  // octaves; day 2: a tight cluster inside one bucket (the sliver ==
  // whole-window worst case); day 3: one event that holds the
  // watermark -> its window is open and must be withheld.
  private val log = Seq(
    (1L, ts(1, 1), 0.05), (2L, ts(1, 3), 0.31), (3L, ts(1, 5), 1.27),
    (4L, ts(1, 7), 5.11), (5L, ts(1, 9), 20.48), (6L, ts(1, 11), 81.92),
    (7L, ts(1, 13), 81.93),
    (8L, ts(2, 2), 3.00), (9L, ts(2, 4), 3.01), (10L, ts(2, 6), 3.02),
    (11L, ts(2, 8), 3.03),
    (12L, ts(3, 0), 9.99)
  ).toDF("event_id", "ts", "value")

  test("flush boundary, cell parity with the batch sketch, mass pin, " +
    "and the est<=exact<=est*17/16 bound") {
    val got = Incremental.streamWindowQuantiles(spark, log).collect()
    assert(got.length == 2, s"expected 2 flushed windows, got ${got.length}")
    val ref = log
      .select(col("ts"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(window(col("ts"), "24 hours"))
      .agg(expr("hist_sketch(cents)").as("h"), count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        expr(graft.functions.HistSketch.fpSql("h")).as("fp"), col("n"))
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    got.foreach { r =>
      val (fp, n) = ref(r.getTimestamp(0))
      assert(r.getLong(3) == fp, s"hist_fp mismatch at ${r.getTimestamp(0)}")
      assert(r.getLong(2) == n && r.getBoolean(4), "mass pin")
      for ((e, x, okI) <- Seq((5, 6, 7), (8, 9, 10), (11, 12, 13))) {
        assert(r.getBoolean(okI), s"ok flag at col $okI: $r")
        assert(r.getLong(e) <= r.getLong(x) &&
          r.getLong(x) * 16 <= r.getLong(e) * 17, s"bound at col $e: $r")
      }
    }
    // day 1 percentiles are the hand-checkable ranks of the 7 values
    // (cents 5,31,127,511,2048,8192,8193): p50 = rank 4 = 511; p90 =
    // rank ceil(0.9*7)=7 -> 8193; p99 = rank 7 -> 8193
    val d1 = got.find(_.getTimestamp(0) ==
      Timestamp.valueOf("2024-02-01 00:00:00")).get
    assert(d1.getLong(6) == 511L && d1.getLong(9) == 8193L &&
      d1.getLong(12) == 8193L)
    // day 2's cluster sits in one bucket: all three estimates equal the
    // bucket lower bound, all exacts inside the 1/16 width
    val d2 = got.find(_.getTimestamp(0) ==
      Timestamp.valueOf("2024-02-02 00:00:00")).get
    assert(d2.getLong(5) == d2.getLong(8) && d2.getLong(8) == d2.getLong(11))
  }
}
