package graft

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST3's exactly-once claim, rehearsed instead of argued (r15 verdict
  * item 3): checkpointed streaming state must survive a stop/restart and
  * a crash — not just produce the right answer in one uninterrupted run.
  * Three legs of evidence, all asserted against batch oracles:
  *
  *  1. STATE-STORE CONTINUATION — a watermarked windowed aggregate runs
  *     as two AvailableNow legs against the SAME checkpoint with new
  *     files landing between legs, split so one window STRADDLES the
  *     legs: the second leg must load that window's state from the
  *     store and merge, and the combined output must equal the batch
  *     aggregate over everything (under append mode's watermark cutoff).
  *  2. MID-SWAP CRASH — the upsert sink's documented crash window
  *     (Incremental.scala rename-aside swap: live table absent, __old
  *     holding the last committed state) is manufactured on disk between
  *     runs; the next run must restore the table and process new data.
  *  3. REPLAYED MICRO-BATCH — the checkpoint's last commit marker is
  *     deleted (a crash after foreachBatch ran but before the commit
  *     landed); the restarted stream REPLAYS that batch, and the
  *     latest-per-key merge must leave the table bit-identical — no
  *     duplicates, no loss. This is the idempotency the q110 scaladoc
  *     claims; here it is executed.
  */
class CrashRecoverySpec extends SparkSpec {

  private lazy val t = T(spark, "/root/testdata/sf0.001")

  test("state-store continuation across two AvailableNow legs") {
    val input = t.events.filter(col("event_id") % 2 === 0)
      .select("event_id", "ts", "user_id", "value")
    // split mid-window: half a day past the median event, so the window
    // containing the split gets events in BOTH legs
    val splitTs = input.agg(expr("percentile_approx(ts, 0.5)")).head()
      .getTimestamp(0)
    val legA = input.filter(col("ts") <= lit(splitTs))
    val legB = input.filter(col("ts") > lit(splitTs))
    assert(legA.count() > 0 && legB.count() > 0)
    // the straddle premise: the 24h epoch-aligned window containing the
    // split must have events on both sides
    val straddleWin = legA
      .select(window(col("ts"), "24 hours")("start").as("ws"))
      .agg(max("ws")).head().getTimestamp(0)
    assert(legB.filter(window(col("ts"), "24 hours")("start") === lit(straddleWin))
      .count() > 0, "split must straddle a window or the test proves nothing")

    val tmp = TmpDirs.fresh("graft_crashrec_", "winagg")
    val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val outDir = s"$tmp/out"
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    def runLeg(): Unit = {
      val q = s2.readStream.schema(input.schema).parquet(inDir)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "24 hours"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("win_start"), col("n"), col("total"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    legA.coalesce(1).write.mode("overwrite").parquet(inDir)
    runLeg()
    legB.coalesce(1).write.mode("append").parquet(inDir)
    runLeg()
    val streamed = spark.read
      .schema("win_start timestamp, n bigint, total double").parquet(outDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    // batch oracle over A∪B with append mode's cutoff: windows whose end
    // is ≤ the final watermark (= max event time) are flushed; the open
    // tail window is withheld in state when the run terminates
    val maxTs = input.agg(max("ts")).head().getTimestamp(0)
    val oracle = input
      .groupBy(window(col("ts"), "24 hours"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .filter(col("window.end") <= lit(maxTs))
      .select(col("window.start").as("win_start"), col("n"), col("total"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(streamed.length == oracle.length && streamed.nonEmpty,
      s"row count drift: ${streamed.length} vs ${oracle.length}")
    streamed.zip(oracle).foreach { case (s, o) => assert(s == o, s"$s != $o") }
  }

  private def upsertFixture() = {
    val base = t.events.filter(col("event_id") % 7 === 3)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), lit(1).as("version"))
    val updates = base.filter(col("event_id") % 2 === 1)
      .withColumn("version", lit(2))
      .withColumn("value", round(col("value") + lit(100.0), 2))
    val oracle = base.unionByName(updates)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_id").orderBy(col("version").desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .collect().map(_.toSeq).sortBy(_.toString)
    (base, updates, oracle)
  }

  private def readTable(outDir: String, schema: org.apache.spark.sql.types.StructType) =
    spark.read.schema(schema).parquet(outDir)
      .collect().map(_.toSeq).sortBy(_.toString)

  test("mid-swap crash: next run restores the table and catches up") {
    val (base, updates, oracle) = upsertFixture()
    val tmp = TmpDirs.fresh("graft_crashrec_", "midswap")
    val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val outDir = s"$tmp/table"
    base.coalesce(1).write.mode("overwrite").json(inDir)
    streaming.Incremental.runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    // manufacture the documented crash window: out→__old done, __staged
    // →out never happened — the live table is ABSENT and __old holds the
    // last committed state (Incremental.scala startup-recovery contract)
    val out = new java.io.File(outDir)
    assert(out.exists())
    assert(out.renameTo(new java.io.File(outDir + "__old")))
    // new data lands, the cron tick runs again with the same checkpoint
    updates.coalesce(1).write.mode("append").json(inDir)
    streaming.Incremental.runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    val got = readTable(outDir, base.schema)
    assert(got.length == oracle.length && got.nonEmpty)
    got.zip(oracle).foreach { case (g, o) => assert(g == o, s"$g != $o") }
    assert(!new java.io.File(outDir + "__old").exists(),
      "recovery must clean the aside copy")
  }

  test("replayed micro-batch after a lost commit is idempotent") {
    val (base, updates, oracle) = upsertFixture()
    val tmp = TmpDirs.fresh("graft_crashrec_", "replay")
    val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"; val outDir = s"$tmp/table"
    base.coalesce(1).write.mode("overwrite").json(inDir)
    streaming.Incremental.runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    updates.coalesce(1).write.mode("append").json(inDir)
    streaming.Incremental.runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    val afterBoth = readTable(outDir, base.schema)
    assert(afterBoth.length == oracle.length)
    afterBoth.zip(oracle).foreach { case (g, o) => assert(g == o) }
    // crash AFTER foreachBatch committed the table but BEFORE the
    // checkpoint recorded the batch: drop the newest commit marker —
    // the restarted stream replays that micro-batch against the
    // already-upserted table
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.length >= 2, s"expected ≥2 commits, got ${commits.length}")
    // the local checksum filesystem keeps a .N.crc sibling — a real crash
    // loses both; leaving it behind makes the replay's atomic re-create
    // fail and masquerade as a concurrent-query error
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    streaming.Incremental.runFileUpsertStream(spark, inDir, base.schema,
      Seq("event_id"), "version", ckpt, outDir)
    val afterReplay = readTable(outDir, base.schema)
    assert(afterReplay.length == oracle.length,
      s"replay changed cardinality: ${afterReplay.length} vs ${oracle.length}")
    afterReplay.zip(oracle).foreach { case (g, o) =>
      assert(g == o, s"replay corrupted state: $g != $o") }
  }
}
