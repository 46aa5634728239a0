package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of q76's cost at sf0.1 (dev only). */
object Q76Probe {
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
    val t = Tables.T(spark, sfDir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q76probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    // warm table cache
    t.documents.count()
    for (r <- 1 to 3) {
      val dw = t.documents
        .select(col("doc_id"), col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .groupBy("doc_id", "lang", "w")
        .agg(count(lit(1)).as("n_occ"))
        .localCheckpoint(false)
      time(s"rep$r dw-materialize")(dw.write.mode("overwrite").format("noop").save())
      val lm = dw.groupBy("lang", "w").agg(sum("n_occ").as("wc"))
      time(s"rep$r lm-agg")(lm.write.mode("overwrite").format("noop").save())
      val joined = dw.join(lm, Seq("lang", "w"))
        .groupBy("doc_id")
        .agg(sum("n_occ").as("n_tokens"), count(lit(1)).as("vocab_seen"),
          sum(col("n_occ") * col("wc")).as("sum_freq"), min("wc").as("min_freq"))
      time(s"rep$r join+agg")(joined.write.mode("overwrite").format("noop").save())
      time(s"rep$r full")(SparkEntry.queries("q76_rarity_score")(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
