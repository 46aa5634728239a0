package graft

import org.apache.spark.sql.SparkSession

/** Scratch floor probe (not part of the library surface): decompose the
  * per-query fixed cost — session noop floor, analysis cost, range-sort
  * tail — for a handful of trivial queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm everything once
    for (_ <- 1 to 2) {
      noop(spark.range(10).toDF())
      noop(SparkEntry.queries("q17_price_tiers")(spark, sfDir))
      noop(SparkEntry.queries("q51_hash_sample")(spark, sfDir))
      noop(SparkEntry.queries("q12_event_counts")(spark, sfDir))
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("range1_noop") { noop(spark.range(1).toDF()) }
      time("scan_only_events") { noop(Tables.load(spark, sfDir, "events").limit(0)) }
      val t = Tables.T(spark, sfDir)
      time("q17_build_analyze") {
        val df = SparkEntry.queries("q17_price_tiers")(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+planning, no exec
      }
      time("q17_full") { noop(SparkEntry.queries("q17_price_tiers")(spark, sfDir)) }
      time("q17_no_sort") {
        noop(operators.Relational.q17PriceTiers(t).sortWithinPartitions("tier"))
      }
      time("q12_full") { noop(SparkEntry.queries("q12_event_counts")(spark, sfDir)) }
      time("q12_scan_agg_only") {
        noop(Tables.load(spark, sfDir, "events").groupBy("event_type").count())
      }
      time("q12_coalesce1_sort") {
        noop(Tables.load(spark, sfDir, "events").groupBy("event_type").count()
          .coalesce(1).sortWithinPartitions("event_type"))
      }
      time("events_count") {
        Tables.load(spark, sfDir, "events").selectExpr("count(event_type)").write.mode("overwrite").format("noop").save()
      }
      time("q51_full") { noop(SparkEntry.queries("q51_hash_sample")(spark, sfDir)) }
      time("q09_full") { noop(SparkEntry.queries("q09_global_rank")(spark, sfDir)) }
    }
    spark.stop()
  }
}
