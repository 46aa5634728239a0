package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch probe: JOB CENSUS of declared queries (r18 optimization
  * round). For each named query: one warm pass, then a timed pass under
  * a job listener — prints per-job wall, the driver-side gaps between
  * jobs, and the summary (wall = in-job + between-job + tail). The
  * multi-job iterative families (BPE training, Lloyd, PageRank) spend
  * real wall time OUTSIDE jobs (planning, codegen, collect round-trips);
  * this probe is how the round told scheduler/driver overhead apart from
  * executor work before touching any operator.
  *
  *   sbt "runMain graft.TrainJobProbe q182_lex_bpe_store[,q157_ivf_pq...] [sfDir]"
  */
object TrainJobProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q182_lex_bpe_store"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = HarnessTuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      def run(): Unit =
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      run() // warm: codegen + page cache

      @volatile var events = Vector.empty[(Int, Long, Long)]
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          starts.put(js.jobId, js.time)
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          val s = Option(starts.get(je.jobId)).getOrElse(0L)
          events :+= ((je.jobId, s, je.time))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      run()
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1200)
      spark.sparkContext.removeSparkListener(l)
      val evs = events.sortBy(_._2)
      var prevEnd = 0L
      var jobSum = 0.0
      var gapSum = 0.0
      for ((id, s, e) <- evs) {
        val gap = if (prevEnd == 0) 0.0 else (s - prevEnd).max(0L) / 1e3
        println(f"[$name job $id%3d] ${(e - s) / 1e3}%8.3f s  gap-before $gap%8.3f s")
        jobSum += (e - s) / 1e3
        gapSum += gap
        prevEnd = e
      }
      println(f"[$name] wall=$wallS%.2f s jobs=${evs.size}%d " +
        f"in-job=$jobSum%.2f s between-job=$gapSum%.2f s")
    }
    spark.stop()
  }
}
