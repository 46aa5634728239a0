package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout for the driver.
  *
  * Each query runs `reps` times (default 2: one warm-up that pays JIT /
  * whole-stage-codegen compile / page-cache costs, then the steady-state
  * rep that is reported). Failures propagate into the JSON as
  * `"errors":{name:msg}` instead of being silently recorded as -1 —
  * a bench over failing queries is not a bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var errors = Map.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Materialize every output row (not just count()) so the measured
      // plan includes the final projection, same work the verify dump does.
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val times = (1 to reps).map(_ => once())
        // min across reps: the steady-state estimator most robust to GC
        // pauses / host contention (first rep still pays JIT+codegen).
        name -> times.min
      } catch {
        case e: Throwable =>
          errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          name -> -1.0
      }
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // estimator is declared in the artifact so cross-round comparisons are
    // never silently apples-to-oranges (r01/r02 reported the LAST rep;
    // r03 onward report min-of-reps)
    println(s"""{"metric":"total","value":$total,"unit":"sec","estimator":"min-of-$reps-reps","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
