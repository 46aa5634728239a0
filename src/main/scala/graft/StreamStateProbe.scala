package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming skew/state-size rehearsal (scratch tooling — r16 verdict
  * item 5): the q92 session-window aggregate run as a REAL multi-batch
  * watermarked stream under RocksDB on the uniform-vs-zipf 30× pair,
  * with the state-store metrics recorded per micro-batch — state rows,
  * updated rows, store memory, commit latency — the streaming member
  * of the skew story. The batch skew rehearsal showed q92's cell
  * lifecycle-floor-dominated; this probe separates the floor from the
  * state machinery by forcing several data batches (time-ranged input
  * files + maxFilesPerTrigger) and reading StreamingQueryProgress
  * instead of wall time.
  *
  * The watermark delay EXCEEDS the corpus span (45 days vs 30): the
  * parquet file source orders same-mtime files unpredictably, so any
  * in-span watermark drops whole batches as late (measured: a 24 h
  * delay dropped batches 2–3 entirely) and the state cells would
  * meter an accidentally-truncated corpus. With nothing dropped and
  * nothing evicted, stateRows/memory meter TOTAL session state — the
  * growth story; eviction semantics are pinned by q92's own oracle
  * gate and SessionsSpec, not here.
  *
  * q110's upsert rides along as wall-time cells only: its stream is
  * deliberately STATELESS (foreachBatch file-merge — the dedup state
  * lives in the sink table, the 100 TB design), so it has no state
  * operator to meter; the cells show the zipf corpus does not move
  * its cost.
  *
  *   sbt "runMain graft.ScaleGen 30 /tmp/graft_sf3"
  *   sbt "runMain graft.ScaleGen 30 /tmp/graft_sf3z zipf"
  *   sbt "runMain graft.StreamStateProbe"
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/tmp/graft_sf3"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    // naive parquet timestamps must read LTZ — NTZ event time is
    // rejected by withWatermark (the Tables.load discipline)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

    // third axis: RocksDB CHANGELOG checkpointing — the knob the
    // rewrite-per-batch finding points at (commit uploads the delta
    // log instead of snapshotting the store; snapshots move to async
    // maintenance) — measured on the same corpora as a third leg
    val legs = Seq(
      ("uniform", root, false), ("zipf", s"${root}z", false),
      ("zipf+changelog", s"${root}z", true))
    for ((tag, dir, changelog) <- legs) {
      val events = spark.read.parquet(s"$dir/events.parquet")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
      val tmp = TmpDirs.fresh("graft_sstate_", tag)
      val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val outDir = s"$tmp/out"
      // 12 time-ranged files → 4 data batches of 3 files each: state
      // grows across batches; the 45-day watermark (> corpus span, see
      // the header scaladoc) means nothing drops and nothing evicts —
      // growth is what these cells meter
      events.repartitionByRange(12, col("ts"))
        .write.mode("overwrite").parquet(inDir)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      if (changelog) s2.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      val stream = s2.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "3").parquet(inDir)
      val agg = stream
        .withWatermark("ts", "45 days")
        .groupBy(col("user_id"),
          session_window(col("ts"),
            s"${operators.Sessions.SessionGapSeconds} seconds").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("n_events"), col("total_value"))
      val q = agg.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      for (p <- q.recentProgress; so <- p.stateOperators) {
        println(f"[sstate] $tag%-8s batch=${p.batchId}%-3d " +
          f"rows=${p.numInputRows}%-7d stateRows=${so.numRowsTotal}%-7d " +
          f"updated=${so.numRowsUpdated}%-7d removed=${so.numRowsRemoved}%-7d " +
          f"stateMemMB=${so.memoryUsedBytes / 1024.0 / 1024.0}%6.1f " +
          f"commitMs=${so.commitTimeMs}%-6d batchMs=${p.batchDuration}%-6d")
      }
    }

    // q110 upsert wall cells (stateless stream; sink-table merge)
    for ((tag, dir) <- Seq("uniform" -> root, "zipf" -> s"${root}z")) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q110_streaming_upsert")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"[sstate] q110 $tag%-8s ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        "(stateless foreachBatch merge - no state operator to meter)")
    }
    spark.stop()
  }
}
