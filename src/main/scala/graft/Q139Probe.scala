package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the library surface): decompose q139 —
  * edge-build leg vs superstep leg, and exchange count in the plan. */
object Q139Probe {
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
      println(f"[p139] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    val t = Tables.T(spark, sfDir)
    def edgesOnce = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(expr("o_custkey * 2").as("src"),
        expr("l_suppkey * 2 + 1").as("dst"))
      .distinct()
    // warm
    operators.Graph.q139Pagerank(t).write.mode("overwrite").format("noop").save()
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val was = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val e = time("ckpt-edges") {
        edgesOnce.unionByName(
            edgesOnce.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(32, col("src"))
          .dropDuplicates("src", "dst")
          .localCheckpoint(false)
      }
      val v = time("ckpt-verts") {
        val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        deg.select(col("src").as("node"), col("outdeg"))
          .crossJoin(broadcast(deg.agg(count(lit(1)).as("nn"))))
          .withColumn("base", expr("((15 * 1000000000L) DIV 100) DIV nn"))
          .localCheckpoint(false)
      }
      spark.conf.set("spark.sql.adaptive.enabled", was)
      val full = time("construct") { operators.Graph.q139Pagerank(t) }
      time("exec") { full.write.mode("overwrite").format("noop").save() }
    }
    val df = operators.Graph.q139Pagerank(t)
    val plan = df.queryExecution.executedPlan.toString
    println("[p139] exchanges in initial physical plan: " +
      "Exchange".r.findAllIn(plan).size)
    df.explain("formatted")
    spark.stop()
  }
}
