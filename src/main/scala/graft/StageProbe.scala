package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe: per-query job/stage/task counts and task-time totals under
  * the Bench config — splits a floor-band query's wall into scheduling
  * shape vs genuine work. Usage: runMain graft.StageProbe q01_...[,q09_...] */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q01_pricing_summary", "q09_global_rank"))
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
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks): Unit
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          taskMs.addAndGet(e.taskInfo.duration): Unit
    })
    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    for (n <- names) {
      run(n) // warm
      (1 to 2).foreach(_ => run(n))
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      run(n)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[stage] $n wall=$wall%.3fs jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} taskTime=${taskMs.get / 1000.0}%.3fs")
    }
    spark.stop()
  }
}
