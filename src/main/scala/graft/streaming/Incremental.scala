package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental / streaming ingest — SURVEY.md §2.13.
  *
  *  - ST1 incremental `since` filtering (base_connector.py:168-183): a
  *    watermark predicate pushed into the batch read.
  *  - ST2 watermark persistence (storage/postgres.py:1575-1594):
  *    MAX(event time) of the processed slice becomes the next `since`.
  *  - ST3 checkpointed micro-batches (ingest.py:30-36): Structured
  *    Streaming file source + foreachBatch upsert with checkpointLocation —
  *    exactly-once per micro-batch, crash-visible partial progress.
  *
  * The foreachBatch sink applies the ReplacingMergeTree read-time rule on
  * every flush (latest version per key wins), so the downstream table is
  * always query-ready without an OPTIMIZE FINAL equivalent.
  */
object Incremental {

  /** ST1/ST2 — one incremental batch pull: rows strictly after `since`,
    * plus the new watermark to persist (null-safe when nothing new). */
  def incrementalSlice(df: DataFrame, tsCol: String,
                       since: Option[java.sql.Timestamp]): (DataFrame, Option[java.sql.Timestamp]) = {
    val slice = since.fold(df)(s => df.filter(col(tsCol) > lit(s)))
    val next = slice.agg(max(tsCol)).collect()(0)
    (slice, Option(next.getAs[java.sql.Timestamp](0)))
  }

  /** ST3 — file-source streaming ingest with a latest-row-per-key upsert
    * sink. Processes everything currently available, then stops (the batch
    * cadence of the reference's cron loop, .github/workflows/scrape.yml).
    *
    * @param keyCols     upsert identity
    * @param versionCol  "latest wins" ordering column
    */
  def runFileUpsertStream(spark: SparkSession, inDir: String, schema: StructType,
                          keyCols: Seq[String], versionCol: String,
                          checkpointDir: String, outDir: String): Unit = {
    // Normalize: a trailing slash would make __staged/__old *children* of
    // the live table dir (read back in by spark.read.parquet, and a rename
    // into its own source).
    val dir = outDir.stripSuffix("/")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(dir)
    val stagedPath = new org.apache.hadoop.fs.Path(dir + "__staged")
    val oldPath = new org.apache.hadoop.fs.Path(dir + "__old")
    // Hadoop FileSystem.rename reports failure by returning false, not
    // throwing — an unchecked rename in the swap would let fs.delete
    // destroy the last committed table while the checkpoint commits.
    def renameOrThrow(from: org.apache.hadoop.fs.Path,
                      to: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename failed: $from -> $to")
    // Startup recovery after a crash mid-swap. The swap below is
    // out→__old, __staged→out, delete __old; the only window where the
    // live table is absent is between the two renames, and __old holds the
    // last committed state then. Restore it — the interrupted micro-batch
    // was never committed to the checkpoint, so it replays (idempotently:
    // the merge is latest-per-key). Leftover __staged/__old dirs from
    // completed or abandoned swaps are plain garbage.
    if (!fs.exists(outPath) && fs.exists(oldPath)) renameOrThrow(oldPath, outPath)
    if (fs.exists(stagedPath)) fs.delete(stagedPath, true)
    if (fs.exists(oldPath)) fs.delete(oldPath, true)
    val stream = spark.readStream.schema(schema).json(inDir)
    val query = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Explicit existence check, not a catch-all: a corrupt or
        // unreadable table must fail the batch loudly, never be silently
        // treated as empty (that would rewrite it with only the new rows).
        val existing =
          if (fs.exists(outPath)) spark.read.parquet(dir)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        val merged = existing.unionByName(batch)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc)
        val latest = merged
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // Stage, then swap via rename-aside: the live table is moved, not
        // deleted, before its replacement lands, so every crash point
        // leaves either the old or the new state recoverable on disk.
        latest.coalesce(1).write.mode("overwrite").parquet(stagedPath.toString)
        if (fs.exists(oldPath)) fs.delete(oldPath, true)
        if (fs.exists(outPath)) renameOrThrow(outPath, oldPath)
        renameOrThrow(stagedPath, outPath)
        // Drop the aside copy only once the new live table is confirmed in
        // place — if anything above threw, __old survives for recovery.
        if (fs.exists(outPath)) fs.delete(oldPath, true)
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** ST7-adjacent — event-time tumbling window aggregate with a watermark,
    * the Structured Streaming shape for the rolling 7/30-day batch windows. */
  def windowedCounts(stream: DataFrame, tsCol: String, window_ : String,
                     watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

  /** Streaming exact dedup — the ingestion-time member of the dedup
    * family (batch read-time dedup is q24): drop re-deliveries of the
    * same content keys as they stream in, keeping state only within the
    * watermark. `dropDuplicatesWithinWatermark` (not plain
    * `dropDuplicates`) is the 100 TB shape: unbounded-state dedup on an
    * infinite stream eventually OOMs every executor, while
    * within-watermark state is evicted as event time advances — the same
    * bounded-state reasoning the reference applies by deduping against
    * the STORE on upsert (storage/postgres.py:228-270) rather than
    * keeping an in-process seen-set. */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String,
                     keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** q72 — the streaming exact-dedup path end-to-end as a declared query
    * (r7 ask: give the last scalatest-only component a driver-checked
    * row): a bounded events slice plus a simulated at-least-once
    * re-delivery of half its rows is written to a file source, streamed
    * through `streamingDedup`, sunk to parquet, and read back. Every
    * re-delivered row is an exact copy keyed by event_id, so the deduped
    * table equals the original slice and the whole pipeline is
    * oracle-comparable as one DISTINCT — while the Spark side genuinely
    * exercises watermark assignment, streaming state, and the
    * exactly-once file sink.
    *
    * Determinism notes: the slice is coalesced to ONE parquet file so
    * AvailableNow runs a single micro-batch (several batches would let
    * the advancing watermark drop a later batch's old-timestamp rows as
    * late — real streaming semantics, but batch-boundary-dependent);
    * parquet round-trips doubles and microsecond timestamps exactly. */
  def q72StreamingDedup(t: graft.Tables.T): DataFrame = {
    val subset = t.events.filter(col("event_id") % 20 === 0)
      .select("event_id", "ts", "event_type", "value")
    val input = subset.unionByName(subset.filter(col("event_id") % 40 === 0))
    // Deduped rows pass through inside the data batch they arrive in, so
    // the trailing no-data micro-batch would only evict state — skipped
    // (RoundTrip scaladoc).
    RoundTrip.run(t.spark, "graft_q72_", Seq(input), noDataBatches = false) {
      case Seq(stream) => streamingDedup(stream, "ts", "1 hour", Seq("event_id"))
    }.select("event_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** q102 — the ST7 tumbling-window aggregate end-to-end as a declared
    * query (previously spec-only): an events slice streams through
    * [[windowedCounts]] (6-hour event-time windows, zero-delay
    * watermark) into an append-mode parquet sink. Append mode emits a
    * window only once the watermark passes its END, so after the final
    * no-data batch (watermark = max event time) exactly the windows with
    * win_end ≤ max(ts) are flushed and the open tail window is withheld —
    * the same deterministic cutoff rule as q92, replayed by the oracle as
    * a plain filter (the no-data batch is REQUIRED here, unlike q98/q99:
    * it is what advances the watermark and flushes the windows).
    * Spark aligns tumbling windows to the unix epoch; the oracle's
    * `time_bucket` gets the same origin explicitly. */
  def q102StreamingWindow(t: graft.Tables.T): DataFrame =
    streamWindowCounts(t.spark, t.events.filter(col("event_id") % 3 === 0)
      .select("event_id", "ts", "event_type", "value"))

  /** The reusable round-trip — public so the spec drives hand-built logs
    * through the identical stage → stream → flush → readback pipeline
    * (pinning the win_end ≤ watermark flush boundary). */
  def streamWindowCounts(spark: SparkSession, input: DataFrame): DataFrame =
    // noDataBatches stays TRUE: the final empty batch advances the
    // watermark and is what FLUSHES the closed windows in append mode.
    RoundTrip.run(spark, "graft_q102_", Seq(input)) { case Seq(stream) =>
      windowedCounts(stream, "ts", "6 hours", "0 seconds")
        .select(col("window.start").as("win_start"),
          col("window.end").as("win_end"),
          col("event_type"), col("n"),
          round(col("total"), 2).as("total"))
    }.orderBy("win_start", "event_type")

  /** q134 — a MERGEABLE SKETCH AS STREAMING STATE: per-day distinct-user
    * cardinality through a real watermarked streaming aggregation whose
    * aggregate is the engine's own `hll_distinct`
    * (`functions/HllDistinct.scala`). This is the capstone the sketch
    * family exists for at 100 TB: the state store holds one 512-byte
    * register buffer per open window (a streaming `count(DISTINCT)` is
    * impossible — Spark rejects distinct aggregates on streams, and an
    * exact per-window user set would grow with the key universe), the
    * buffer partial-merges across micro-batches exactly like any sum,
    * and append mode flushes each window's summary once the watermark
    * passes its end (q102's cutoff rule; the oracle replays it as the
    * same filter). The exact verification column CANNOT come from the
    * stream for the same reason — the batch readback joins a plain
    * `count(DISTINCT)` over the identical input slice, and `ok` pins
    * the estimate within 15%%. At ~100–150 users per day against 512
    * registers the raw estimator's small-range bias would dominate, so
    * these windows exercise HLL's LINEAR-COUNTING branch (n_zero > 0,
    * raw ≤ 2.5m) — the branch q129's large shingle strata never hit;
    * between the two queries both estimator paths are oracle-pinned. */
  def q134StreamingHll(t: graft.Tables.T): DataFrame =
    streamWindowHll(t.spark, t.events.filter(col("event_id") % 2 === 0)
      .select("event_id", "ts", "user_id"))

  /** The reusable round-trip — public so a spec can drive hand-built
    * logs through the identical stage → stream → flush → readback
    * pipeline. */
  def streamWindowHll(spark: SparkSession, input: DataFrame): DataFrame = {
    val streamed = RoundTrip.run(spark, "graft_q134_", Seq(input)) {
      case Seq(stream) =>
        stream.withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "24 hours"))
          .agg(expr("hll_distinct(CAST(user_id AS STRING))").as("h"),
            count(lit(1)).as("n_events"))
          .select(col("window.start").as("win_start"),
            col("window.end").as("win_end"),
            col("h.n_zero").as("n_zero"), col("h.sum_rho").as("sum_rho"),
            col("h.reg_fp").as("reg_fp"), col("h.z_scaled").as("z_scaled"),
            col("n_events"))
    }
    val exact = input
      .groupBy(window(col("ts"), "24 hours"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .select(col("window.start").as("win_start"), col("exact"))
    streamed.join(exact, Seq("win_start"))
      .withColumn("est", graft.operators.HllEstimate.estimate(
        col("n_zero"), col("z_scaled")))
      .withColumn("ok", graft.operators.HllEstimate.okBound(
        col("est"), col("exact")))
      .select("win_start", "win_end", "n_events", "n_zero", "sum_rho",
        "reg_fp", "z_scaled", "est", "exact", "ok")
      .orderBy("win_start")
  }

  /** q153 — STREAMING TOP-K: per-day heaviest event types through the
    * same watermarked streaming aggregation shape as q134/q140, with
    * `heavy_hitters` (`functions/HeavyHitters.scala`, SpaceSaving) as
    * the aggregate — completing the sketch-as-streaming-state trio:
    * HLL (how many distinct, q134), quantile histogram (where the
    * distribution sits, q140), SpaceSaving (WHICH keys dominate, this).
    * An exact streaming top-k is impossible for the same reason as the
    * other two — per-window state would have to hold every key's count
    * — while the k-slot counter map partial-merges across micro-batches
    * (the Metwally merge with the floor device q125 documents) and
    * append mode flushes each closed window once the watermark passes.
    * The per-window key domain here (event types) is smaller than
    * k = 8, so the sketch is PROVABLY exact (err = 0 — the q125
    * contract) and the oracle replays plain per-window counts with the
    * sketch's (count DESC, item) order. 100 TB shape: state per open
    * window is k counters regardless of event volume. */
  def q153StreamingTopk(t: graft.Tables.T): DataFrame =
    streamWindowTopk(t.spark, t.events.filter(col("event_id") % 2 === 1)
      .select("event_id", "ts", "event_type"))

  /** The reusable round-trip — public for spec-driven hand-built logs. */
  def streamWindowTopk(spark: SparkSession, input: DataFrame): DataFrame = {
    val streamed = RoundTrip.run(spark, "graft_q153_", Seq(input)) {
      case Seq(stream) =>
        stream.withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "24 hours"))
          .agg(expr("heavy_hitters(event_type, 8)").as("hh"),
            count(lit(1)).as("n_events"))
          .select(col("window.start").as("win_start"),
            col("window.end").as("win_end"), col("hh"), col("n_events"))
    }
    streamed
      .select(col("win_start"), col("win_end"), col("n_events"),
        posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("win_start"), col("win_end"), col("n_events"),
        (col("pos") + 1).cast("int").as("rank"),
        col("e.item").as("item"), col("e.count").as("cnt"),
        col("e.err").as("err"))
      .orderBy("win_start", "rank")
  }

  /** q140 — STREAMING QUANTILES: per-day p50/p90/p99 event-value
    * latency-style percentiles through the same watermarked streaming
    * aggregation shape as q134, with `hist_sketch`
    * (`functions/HistSketch.scala`) as the aggregate. The pair completes
    * the sketch-as-streaming-state story: an exact streaming percentile
    * is impossible for the same reason as a streaming count(DISTINCT) —
    * per-window state would have to hold every value — while the
    * histogram's 960-cell buffer partial-merges across micro-batches
    * like any sum and append mode flushes each closed window once. The
    * SINK PERSISTS THE RAW CELL ARRAY (the q135 registers-as-warehouse
    * pattern: whoever reads the table can re-aggregate or re-cut
    * without touching raw events); the batch readback then walks the
    * STORED sketch in-row (cumArr + rank targets — the q137 machinery)
    * and joins the exact rank-walk percentiles computed from the same
    * input slice, pinning est ≤ exact ≤ est·17/16 per window in pure
    * integer arithmetic, plus the cell fingerprint and mass == n_events
    * (the state really saw every row). */
  def q140StreamingQuantiles(t: graft.Tables.T): DataFrame =
    streamWindowQuantiles(t.spark, t.events.filter(col("event_id") % 2 === 1)
      .select("event_id", "ts", "value"))

  /** The reusable round-trip — public for spec-driven hand-built logs. */
  def streamWindowQuantiles(spark: SparkSession, input: DataFrame): DataFrame = {
    import graft.functions.HistSketch.{cumSql, fpSql, lbSql}
    val cents = input.select(col("event_id"), col("ts"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val streamed = RoundTrip.run(spark, "graft_q140_", Seq(cents)) {
      case Seq(stream) =>
        stream.withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "24 hours"))
          .agg(expr("hist_sketch(cents)").as("h"),
            count(lit(1)).as("n_events"))
          .select(col("window.start").as("win_start"),
            col("window.end").as("win_end"), col("h"), col("n_events"))
    }
    val quantiles = Seq( // rank target ⌈q·n⌉, templated over the n column
      ("p50", "(%s + 1) DIV 2"),
      ("p90", "(%s * 9 + 9) DIV 10"),
      ("p99", "(%s * 99 + 99) DIV 100"))
    // quantile read over the STORED arrays: ≤ window-count rows, in-row
    // walk, no cell explode (localCheckpoint = the projection barrier
    // the fold needs, see HistSketch.cumSql)
    val est0 = streamed
      .withColumn("cumArr", expr(cumSql("h")))
      .withColumn("n", expr("element_at(cumArr, 960)"))
      .withColumn("hist_fp", expr(fpSql("h")))
    val est = quantiles.foldLeft(est0) { case (df, (tag, target)) =>
      df.withColumn(s"${tag}_pos",
          expr(s"size(filter(cumArr, c -> c < (${target.format("n")})))"))
        .withColumn(s"${tag}_est", expr(lbSql(s"${tag}_pos")))
    }.drop("h", "cumArr")
      .localCheckpoint(false)
    // exact verification leg: the naive per-window rank walk over the
    // same slice — bounded per window, and exactly what the oracle
    // replays
    val rk = cents
      .withColumn("win_start", window(col("ts"), "24 hours")("start"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("win_start").orderBy("cents")))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("win_start")))
    val exactAggs = quantiles.map { case (tag, target) =>
      min(when(col("rn") === expr(target.format("cnt")), col("cents")))
        .as(s"${tag}_exact")
    }
    val exact = rk.groupBy("win_start").agg(exactAggs.head, exactAggs.tail: _*)
    def ok(e: String, x: String) = col(e) <= col(x) && col(x) * 16 <= col(e) * 17
    est.join(exact, Seq("win_start"))
      .withColumn("ok50", ok("p50_est", "p50_exact"))
      .withColumn("ok90", ok("p90_est", "p90_exact"))
      .withColumn("ok99", ok("p99_est", "p99_exact"))
      .withColumn("mass_matches", col("n") === col("n_events"))
      .select("win_start", "win_end", "n_events", "hist_fp", "mass_matches",
        "p50_est", "p50_exact", "ok50", "p90_est", "p90_exact", "ok90",
        "p99_est", "p99_exact", "ok99")
      .orderBy("win_start")
  }

  /** q110 — the ST3 checkpointed foreachBatch upsert end-to-end as a
    * declared query (previously spec-only, the last §2.13 leg without a
    * CORRECTNESS row): TWO ingest waves through [[runFileUpsertStream]]
    * against ONE checkpoint. Wave 1 loads a base slice; wave 2 appends
    * re-deliveries of the odd ids with version 2 and shifted values; the
    * second run RESUMES from the commit log, processes only the new
    * file, and the latest-version-per-key merge leaves exactly the
    * upserted table — which the oracle replays as a plain
    * row_number-over-version. This is the reference's cron-cadence
    * ingest loop (ingest.py:30-36): each run picks up where the
    * checkpoint left off, and a crash between waves replays idempotently
    * (the rename-aside swap inside the sink, spec-pinned in
    * SourcesStreamingSpec). Versions are explicit ints and values
    * 2-dp-rounded doubles, so the json staging round-trips exactly. */
  def q110StreamingUpsert(t: graft.Tables.T): DataFrame = {
    val spark = t.spark
    val base = t.events.filter(col("event_id") % 7 === 3)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), lit(1).as("version"))
    val updates = base.filter(col("event_id") % 2 === 1)
      .withColumn("version", lit(2))
      .withColumn("value", round(col("value") + lit(100.0), 2))
    // One scratch tree PER INVOCATION (r12 advice — the r11 shape reused
    // one per-sfDir tree with a delete-on-entry reset, which raced a
    // concurrent execution or a late re-execution of a previously
    // returned frame): each run NEEDS a fresh checkpoint (a reused
    // commit log would treat the rewritten input as already processed),
    // fresh dirs make that trivially true, the slice is ~1% of events so
    // per-rep growth is KBs, and the whole root is shutdown-swept.
    val tmp = graft.TmpDirs.fresh("graft_q110_", t.sfDir)
    val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val outDir = s"$tmp/table"
    base.coalesce(1).write.mode("overwrite").json(inDir)
    runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    updates.coalesce(1).write.mode("append").json(inDir)
    runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    // A wave with zero input rows never fires foreachBatch, so the table
    // dir may not exist — an empty slice yields the empty table, not a
    // missing-path crash.
    val table =
      if (new java.io.File(outDir).exists()) spark.read.parquet(outDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], base.schema)
    table.orderBy("event_id")
  }

  /** q92 — streaming SESSIONIZATION end-to-end as a declared query: the
    * q88 session_window aggregate run as a real watermarked streaming
    * job (file source → SessionWindowStateStore → append-mode parquet
    * sink → readback), exercising the state machinery q72 does not
    * touch: session merge in the state store and WATERMARK EVICTION —
    * append mode only emits a session once the watermark passes its end,
    * so with a zero-delay watermark (= max event time after the final
    * no-data batch) exactly the sessions with session_end ≤ max(ts) are
    * flushed and the rest stay in state when the AvailableNow run
    * terminates. That cutoff is deterministic — session_end = last event
    * + gap, so emitted ⇔ the session's last event is ≥ gap before the
    * stream's max ts — and the oracle replays it as a plain filter on
    * the batch sessionization (boundary ties are µs-improbable on real
    * data; SessionsSpec pins batch/stream parity in complete mode where
    * nothing is withheld).
    *
    * The events slice (every 5th row) keeps the streaming round-trip
    * proportionate; one parquet file → one data micro-batch, then the
    * final empty batch advances the watermark and flushes (the same
    * single-file determinism note as q72). */
  def q92StreamingSessions(t: graft.Tables.T): DataFrame =
    streamSessions(t.spark, t.events.filter(col("event_id") % 5 === 0)
      .select("user_id", "event_id", "ts", "event_type", "value"))

  /** The reusable streaming-session round-trip — public so specs drive
    * hand-built logs through the identical stage → stream → flush →
    * readback pipeline (SessionsSpec pins the watermark-withholding
    * rule on a crafted boundary log). */
  def streamSessions(spark: SparkSession, input: DataFrame): DataFrame =
    // noDataBatches stays TRUE: the final empty batch advances the
    // watermark and flushes the closed sessions (scaladoc above).
    RoundTrip.run(spark, "graft_q92_", Seq(input)) { case Seq(stream) =>
      graft.operators.Sessions.sessionWindowAgg(stream.withWatermark("ts", "0 seconds"))
    }.select("user_id", "session_start", "session_end", "n_events", "total_value")
      .orderBy("user_id", "session_start")
}
