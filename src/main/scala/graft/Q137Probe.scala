package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch probe (not part of the library surface): decompose q137's two
  * jobs — the sketch-collect leg and the sliver exec leg. */
object Q137Probe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p137] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    import spark.implicits._
    val t = Tables.T(spark, sfDir)
    def vals = t.lineitem
      .filter(col("l_returnflag").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("grain"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    // warm
    vals.write.mode("overwrite").format("noop").save()
    operators.ScaleTechniques.q137HistQuantiles(t).write.mode("overwrite").format("noop").save()
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("scan-only") { vals.write.mode("overwrite").format("noop").save() }
      time("sketch-collect") {
        vals.rollup("grain").agg(expr("hist_sketch(cents)").as("h"),
          grouping(col("grain")).cast("int").as("g")).collect()
      }
      time("pos-only") {
        vals.withColumn("pos",
          expr(graft.functions.HistSketch.posSql("cents")))
          .write.mode("overwrite").format("noop").save()
      }
      val guide = Seq(("A", "p50", 500, 10L), ("A", "p90", 600, 10L),
        ("N", "p99", 700, 10L)).toDF("ggrain", "tag", "pos", "rk")
      time("hits-join") {
        vals.withColumn("pos",
          expr(graft.functions.HistSketch.posSql("cents")))
          .join(broadcast(guide), Seq("pos"))
          .filter(col("ggrain") === col("grain") || col("ggrain") === "ALL")
          .write.mode("overwrite").format("noop").save()
      }
      time("slivers-agg") {
        vals.withColumn("pos",
          expr(graft.functions.HistSketch.posSql("cents")))
          .join(broadcast(guide), Seq("pos"))
          .filter(col("ggrain") === col("grain") || col("ggrain") === "ALL")
          .groupBy(col("ggrain").as("grain"), col("tag"), col("rk"), col("cents"))
          .agg(count(lit(1)).as("c"))
          .write.mode("overwrite").format("noop").save()
      }
      time("full-q137") {
        operators.ScaleTechniques.q137HistQuantiles(t)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
