package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off decomposition of q60's cost at sf0.1 (dev only). */
object Q60Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    val t = Tables.T(spark, sfDir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q60probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    t.part.count()
    val base = t.part
      .filter(col("p_partkey") % 5 === 0)
      .withColumn("position",
        when(col("p_partkey") % 3 === 0, "support")
          .when(col("p_partkey") % 3 === 1, "oppose")
          .otherwise("neutral"))
      .withColumn("population",
        when(col("p_partkey") % 4 === 0, "ost").otherwise(""))
      .withColumn("pct_prev", (col("p_partkey") % 90 + 5).cast("double"))
    val prev = base.filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("prev_key"), col("position"), col("population"),
        expr("trigram_set(lower(p_name))").as("prev_grams"),
        col("pct_prev").as("prev_pct"))
    val cur = base.select(
      col("p_partkey").as("cur_key"), col("position"), col("population"),
      expr("trigram_set(concat(lower(p_name), ' neu'))").as("cur_grams"),
      (col("pct_prev") +
        when(col("p_partkey") % 9 === 0, 7.0).otherwise(1.0)).as("cur_pct"))
    for (r <- 1 to 3) {
      val joined = cur.join(prev, Seq("position", "population"))
      time(s"rep$r join-only")(joined.write.mode("overwrite").format("noop").save())
      println(s"[q60probe] pair count ${joined.count()}")
      val sims = joined.withColumn("sim", expr("trigram_sim_sorted(cur_grams, prev_grams)"))
        .filter(col("sim") >= 0.72)
      time(s"rep$r join+sim")(sims.write.mode("overwrite").format("noop").save())
      val best = Window.partitionBy("cur_key").orderBy(col("sim").desc, col("prev_key").asc)
      val m = sims.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      time(s"rep$r +window")(m.write.mode("overwrite").format("noop").save())
      time(s"rep$r full")(SparkEntry.queries("q60_snapshot_fuzzy")(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
