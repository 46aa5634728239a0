package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main: time a named query repeatedly, print the plan.
  * Usage: runMain graft.Dev <queryName> <sfDir> [reps] */
object Dev {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      // noop write materializes every output column — count() would let
      // Catalyst prune the very expressions being timed
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[dev] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
