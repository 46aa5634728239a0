package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of SparkEntry.queries under the exact Bench
  * session config. Usage: runMain graft.QBench q23_poll_standings[,q38_...]
  * [reps]. Prints construct/exec per rep and the median. Not part of the
  * driver contract — Bench.scala is the official artifact. */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q23_poll_standings"))
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // ad-hoc conf overrides for floor experiments:
    //   SPARK_GRAFT_CONF="spark.sql.files.maxPartitionBytes=2m;k=v"
    val overrides = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val b0 = HarnessTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    val spark = overrides.foldLeft(b0)((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    for (n <- names)  // warm: staging + codegen + page cache
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      samples(n) = samples(n) :+ (t2 - t0) / 1e9
      println(f"[qbench] $n rep$r construct ${(t1 - t0) / 1e9}%.3f exec ${(t2 - t1) / 1e9}%.3f")
    }
    for (n <- names) {
      val s = samples(n).sorted
      val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"[qbench] $n MEDIAN $med%.3f min ${s.head}%.3f max ${s.last}%.3f")
    }
    spark.stop()
  }
}
