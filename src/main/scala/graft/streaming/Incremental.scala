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
}
