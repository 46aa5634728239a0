package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query timing probe (not part of the library surface):
  * `runMain graft.QueryProbe q66_openalex_parse,q69_eurobarometer_parse 5`
  * times the named queries for N reps each under the same session config
  * as Bench, printing one line per rep. Mins across reps are the
  * contention-robust comparison number on this noisy-neighbor host. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q67_clusters_at_scale")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // one untimed warm pass over every named query (JIT + codegen + page cache)
    for (n <- names) noop(SparkEntry.queries(n)(spark, sfDir))
    for (rep <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(n)(spark, sfDir))
      println(f"[probe] $n rep $rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
