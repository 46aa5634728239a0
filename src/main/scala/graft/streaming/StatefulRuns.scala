package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the one
  * Structured Streaming state API the session-window (q92) and
  * within-watermark-dedup (q72) paths do NOT touch. The operator is a
  * per-user RUN detector (gaps-and-islands): emit one row per maximal run
  * of consecutive same-type events, a sequential state machine that
  * `session_window` cannot express (sessions split on time gaps; runs
  * split on VALUE change regardless of time).
  *
  * This is the event-log-curation sibling of q86-q89 (interaction-trace
  * stages upstream of per-user corpus construction — a run of N identical
  * interactions is the behavioral unit repetition filters score), and the
  * streaming member of the q73 repetition family.
  *
  * 100 TB shape: state per key is ONE (lastType, runStart, lastTs, runLen)
  * tuple — O(1) per user, not O(events) — and is evicted by an event-time
  * timeout one session-gap after the user's last event, so idle keys leave
  * the store as the watermark advances; the shuffle is keyed by user_id
  * exactly like the batch sessionizers. Per micro-batch each group sorts
  * only ITS OWN batch slice (bounded by batch size, not history).
  */
object StatefulRuns {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  /** O(1) per-key state: the currently-open run. Timestamps carried as
    * epoch micros so state comparison/arithmetic is exact integer. */
  case class RunState(lastType: String, runStartUs: Long, lastTsUs: Long, runLen: Long)

  case class Run(user_id: Long, event_type: String, run_start: Timestamp, run_len: Long)

  private def us(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def tsOf(v: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000L))

  /** The state-transition function. Batch rows are sorted by (ts,
    * event_id) — the same total order every batch engine in this repo
    * pins — so the fold is deterministic within a batch, and state carries
    * the open run across batches.
    *
    * Determinism contract for the DECLARED query: only COMPLETED runs are
    * emitted (a run completes when a different type arrives for the same
    * user). The final open run per user is deliberately withheld — it
    * would otherwise be emitted from the timeout callback, and whether
    * that callback runs before an AvailableNow query terminates depends on
    * watermark/batch scheduling, not on the data. The timeout still fires
    * for state EVICTION (bounded state is the point); a production
    * continuous job would emit the open run there too, accepting that the
    * emission time (not content) is schedule-dependent. */
  def detectRuns(key: Long, values: Iterator[Ev],
                 state: GroupState[RunState]): Iterator[Run] = {
    if (!values.hasNext) {
      // Timeout callback — watermark passed lastTs + gap with no new data.
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      val sorted = values.toIndexedSeq.sortBy(e => (us(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Run]
      var st = state.getOption.orNull
      for (e <- sorted) {
        val eUs = us(e.ts)
        if (st == null) st = RunState(e.event_type, eUs, eUs, 1L)
        else if (st.lastType == e.event_type)
          st = st.copy(lastTsUs = eUs, runLen = st.runLen + 1L)
        else {
          out += Run(key, st.lastType, tsOf(st.runStartUs), st.runLen)
          st = RunState(e.event_type, eUs, eUs, 1L)
        }
      }
      state.update(st)
      // Evict this user's state one session gap after their last event.
      state.setTimeoutTimestamp(
        st.lastTsUs / 1000L + graft.operators.Sessions.SessionGapSeconds * 1000L)
      out.iterator
    }
  }

  /** q96 — the custom-state streaming query end-to-end: a bounded events
    * slice staged to a single parquet file (one data micro-batch under
    * AvailableNow, same determinism note as q72/q92), streamed through
    * [[detectRuns]], sunk to parquet, read back. The oracle replays the
    * islands in SQL (lag-change flag → running sum → group) and drops each
    * user's LAST island — exactly the withheld open runs. */
  def q96StatefulRuns(t: graft.Tables.T): DataFrame =
    streamRuns(t.spark, t.events.filter(col("event_id") % 4 === 1)
      .select("user_id", "event_id", "ts", "event_type"))

  /** The reusable round-trip — public so the spec drives hand-built logs
    * through the identical stage → stream → readback pipeline. Completed
    * runs are emitted inside data batches and the open runs are withheld
    * by contract, so the trailing no-data micro-batch would only run the
    * timeout/EVICTION path — skipped (RoundTrip scaladoc). */
  def streamRuns(spark: SparkSession, input: DataFrame): DataFrame = {
    import spark.implicits._
    RoundTrip.run(spark, "graft_q96_", Seq(input), noDataBatches = false) {
      case Seq(stream) =>
        stream.withWatermark("ts", "0 seconds")
          .as[Ev]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(detectRuns)
          .toDF()
    }.select("user_id", "event_type", "run_start", "run_len")
      .orderBy("user_id", "run_start")
  }

  /** The batch replay of the same semantics (lag flag → cumulative island
    * id → per-island aggregate, each user's last island dropped) — the
    * parity anchor the spec compares the streamed output against, and the
    * Spark-side mirror of the DuckDB oracle. One shuffle on user_id; the
    * two window frames and the aggregate share its partitioning. */
  def batchRuns(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val islands = events
      .withColumn("brk",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = islands
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts")).as("run_start"),
        count(lit(1)).as("run_len"))
    val last = runs.groupBy("user_id")
      .agg(max(col("island")).as("last_island"))
    runs.join(last, Seq("user_id"))
      .filter(col("island") =!= col("last_island"))
      .select("user_id", "event_type", "run_start", "run_len")
      .orderBy("user_id", "run_start")
  }
}
