package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: floor cost of trivial queries under config variants. */
object FloorGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val names = Seq("q12_event_counts", "q01_pricing_summary", "q42_hash_family",
      "q17_price_tiers", "q19_date_parts", "q02_weighted_avg",
      "q22_poll_trends", "q34_title_dedup", "q10_semi_anti")
    val combo = Map("spark.shuffle.compress" -> "false",
      "spark.shuffle.spill.compress" -> "false",
      "spark.sql.files.maxPartitionBytes" -> "8m")
    val shipped = combo + ("spark.sql.join.preferSortMergeJoin" -> "false")
    val variants: Seq[(String, Map[String, String])] = Seq(
      "shipped" -> shipped,
      // Force the serialized (Tungsten) shuffle writer: at 32 shuffle
      // partitions the bypass-merge writer opens 32 temp files per map
      // task (32 mappers -> 1024 file creates per exchange).
      "shipped+unsafe" -> (shipped + ("spark.shuffle.sort.bypassMergeThreshold" -> "8")),
      // Shuffle + block-manager scratch on tmpfs: every suite shuffle is
      // sub-MB; file-create + fsync latency dominates, not bandwidth.
      "shipped+shm" -> (shipped + ("spark.local.dir" -> "/dev/shm/graft-floorgrid")),
      "shipped+unsafe+shm" -> (shipped
        + ("spark.shuffle.sort.bypassMergeThreshold" -> "8")
        + ("spark.local.dir" -> "/dev/shm/graft-floorgrid")),
      "noaqe+unsafe+shm" -> (shipped
        + ("spark.sql.adaptive.enabled" -> "false")
        + ("spark.shuffle.sort.bypassMergeThreshold" -> "8")
        + ("spark.local.dir" -> "/dev/shm/graft-floorgrid")),
      "shipped+unsafe+shm2x" -> (shipped
        + ("spark.shuffle.sort.bypassMergeThreshold" -> "8")
        + ("spark.local.dir" -> "/dev/shm/graft-floorgrid")),
    )
    for ((tag, conf) <- variants) {
      val b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        .config("spark.ui.enabled", "false")
      conf.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      Quiet.windowExecWarnings()
      for (n <- names) // warm
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      // irreducible bound: single-stage noop job, and a 2-stage tiny shuffle
      val t0 = System.nanoTime()
      spark.range(32).write.mode("overwrite").format("noop").save()
      val t1 = System.nanoTime()
      spark.range(100000).groupBy((org.apache.spark.sql.functions.col("id") % 5).as("k"))
        .count().write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      println(f"[grid] $tag rawjob ${(t1 - t0) / 1e9}%.3f rawshuffle ${(t2 - t1) / 1e9}%.3f")
      val times = names.map { n =>
        val xs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        n -> xs.min
      }
      println(f"[grid] $tag total ${times.map(_._2).sum}%.3f :: " +
        times.map { case (n, v) => f"${n.take(3)}=$v%.2f" }.mkString(" "))
      spark.stop()
      // allow a fresh context next round
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
