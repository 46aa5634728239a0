package graft

import java.sql.Timestamp

import graft.streaming.Incremental
import org.apache.spark.sql.functions._

/** The q134 streaming-HLL round-trip on a hand log: append-mode flush
  * boundary (win_end ≤ max event time), register parity between the
  * streaming state path and the plain batch aggregate, and the
  * exact-join verification columns. */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-02-0$day $hour%02d:00:00")

  // day 1: users 1,2,3 (one duplicate visit); day 2: users 2,4;
  // day 3: a single lonely event that holds the watermark -> day 3's
  // window is OPEN (win_end > max ts) and must be withheld.
  private val log = Seq(
    (1L, ts(1, 1), 10L), (2L, ts(1, 5), 20L), (3L, ts(1, 9), 30L),
    (4L, ts(1, 13), 10L),
    (5L, ts(2, 2), 20L), (6L, ts(2, 7), 40L),
    (7L, ts(3, 0), 50L)
  ).toDF("event_id", "ts", "user_id")

  test("flush boundary, register parity with the batch aggregate, and ok") {
    val got = Incremental.streamWindowHll(spark, log).collect()
    assert(got.length == 2, s"expected 2 flushed windows, got ${got.length}")
    // batch reference: same windows, same sketch, computed WITHOUT the
    // streaming machinery
    val ref = log
      .groupBy(window(col("ts"), "24 hours"))
      .agg(expr("hll_distinct(CAST(user_id AS STRING))").as("h"),
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("exact"))
      .select(col("window.start").as("win_start"), col("h.n_zero"),
        col("h.sum_rho"), col("h.reg_fp"), col("h.z_scaled"),
        col("n_events"), col("exact"))
      .collect().map(r => r.getTimestamp(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    got.foreach { r =>
      val (nz, sr, fp, z, nev, ex) = ref(r.getTimestamp(0))
      assert(r.getInt(3) == nz && r.getLong(4) == sr && r.getLong(5) == fp &&
        r.getLong(6) == z, s"register mismatch at ${r.getTimestamp(0)}")
      assert(r.getLong(2) == nev && r.getLong(8) == ex)
      // tiny cardinalities sit on the linear-counting branch and are
      // near-exact -> ok must hold
      assert(r.getBoolean(9), s"ok false at ${r.getTimestamp(0)}")
    }
    // the two flushed windows are days 1 and 2 with the right exacts
    val byDay = got.map(r => r.getTimestamp(0) -> r.getLong(8)).toMap
    assert(byDay(Timestamp.valueOf("2024-02-01 00:00:00")) == 3L)
    assert(byDay(Timestamp.valueOf("2024-02-02 00:00:00")) == 2L)
  }
}
