package graft

import org.apache.spark.sql.SparkSession

object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    val names = Seq("q12_event_counts", "q61_auto_review", "q01_pricing_summary", "q42_hash_family")
    // warm
    for (n <- names) SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    for (rep <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      // re-execute the SAME DataFrame (memoized-plan simulation)
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      println(f"[floor] $n construct ${(t1-t0)/1e9}%.3f exec ${(t2-t1)/1e9}%.3f reexec ${(t3-t2)/1e9}%.3f")
    }
    spark.stop()
  }
}
