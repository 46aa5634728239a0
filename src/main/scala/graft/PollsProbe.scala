package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for q23 (not part of the library
  * surface): times each stage of the standings pipeline in isolation. */
object PollsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    val t = Tables.T(spark, sfDir)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q23probe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val stg = graft.operators.Polls.stgPollResultsTable(t)
    time("staging count (warm cache fill)")(stg.count())
    for (rep <- 1 to 2) {
      time(s"rep$rep stg scan count")(stg.count())
      time(s"rep$rep maxD")(stg.agg(max("poll_date")).collect())
      time(s"rep$rep agg1 no-distinct")(
        stg.groupBy("party").agg(
          max(struct(col("poll_date"), col("poll_id"), col("pct"))).as("m1"),
          count(lit(1)).as("n_polls")).collect())
      time(s"rep$rep agg1 with countDistinct")(
        stg.groupBy("party").agg(
          max(struct(col("poll_date"), col("poll_id"), col("pct"))).as("m1"),
          count(lit(1)).as("n_polls"),
          countDistinct("institute_id").as("n_institutes")).collect())
      time(s"rep$rep full q23")(
        graft.operators.Polls.q23PollStandings(t)
          .write.mode("overwrite").format("noop").save())
      val institutes = t.customer.select(
        col("c_custkey"),
        col("c_name").as("institute_name"),
        col("c_mktsegment").as("institute_group"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("party", "institute_id")
        .orderBy(col("poll_date"), col("poll_id"))
      val joined = stg.join(broadcast(institutes),
        col("institute_id") === col("c_custkey"))
      time(s"rep$rep q22 join only")(
        joined.write.mode("overwrite").format("noop").save())
      val windowed = joined
        .withColumn("prev_pct", lag("pct", 1).over(w))
        .withColumn("ma3",
          round(sum("pct").over(w.rowsBetween(-2, 0)), 2) /
            count(lit(1)).over(w.rowsBetween(-2, 0)))
      time(s"rep$rep q22 join+window")(
        windowed.write.mode("overwrite").format("noop").save())
      time(s"rep$rep q22 join+window+sort (no ckpt)")(
        windowed.orderBy("poll_id", "party")
          .write.mode("overwrite").format("noop").save())
      time(s"rep$rep full q22")(
        graft.operators.Polls.q22PollTrends(t)
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
