package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming round-trip floor probe (scratch tooling): how much of
  * q134/q140/q102's wall is the AvailableNow lifecycle itself — stage
  * write, stream start, offset/commit log, state-store setup, sink
  * commit, readback — vs the query's own work? Times a PASS-THROUGH
  * transform through the identical RoundTrip scaffold on the identical
  * input slice, then the real queries; the delta is the honest query
  * cost, the floor is the machinery. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = HarnessTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val t = Tables.T(spark, sfDir)
    val slice = t.events.filter(col("event_id") % 50 === 0)
      .select("event_id", "ts", "user_id", "event_type")
    def floorOnce(noData: Boolean): Unit =
      noop(streaming.RoundTrip.run(spark, "graft_sfloor_", Seq(slice),
        noDataBatches = noData)(ins => ins.head))
    // warm
    floorOnce(true)
    noop(SparkEntry.queries("q134_streaming_hll")(spark, sfDir))
    noop(SparkEntry.queries("q140_streaming_quantiles")(spark, sfDir))
    noop(SparkEntry.queries("q102_streaming_window")(spark, sfDir))
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      println(f"[sfloor] passthrough(noData=true)  ${time(floorOnce(true))}%.2fs")
      println(f"[sfloor] passthrough(noData=false) ${time(floorOnce(false))}%.2fs")
      println(f"[sfloor] q134 ${time(noop(SparkEntry.queries("q134_streaming_hll")(spark, sfDir)))}%.2fs")
      println(f"[sfloor] q140 ${time(noop(SparkEntry.queries("q140_streaming_quantiles")(spark, sfDir)))}%.2fs")
      println(f"[sfloor] q102 ${time(noop(SparkEntry.queries("q102_streaming_window")(spark, sfDir)))}%.2fs")
    }
    spark.stop()
  }
}
