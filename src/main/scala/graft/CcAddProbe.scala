package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q159 incremental-CC cost probe (scratch tooling, not library
  * surface): shows the APPLY path's cost tracks the batch plus one
  * map-side pass over the stored weight table, while the store REBUILD
  * grows with the corpus — the claim that makes daily incremental
  * label maintenance worth running instead of a nightly q151.
  *
  * Fixed batch (sf0.1's post-cutoff orders, ~24% of sf0.1) against a
  * 1× (sf0.1) and a 20× (ScaleProbe-synthesized) base corpus:
  *   - store  = pair-weight aggregate + threshold + full CC over the
  *              base graph (the rebuild path, what q151 pays nightly)
  *   - apply  = delta aggregate + crossing-pair join + label-graph CC
  *              + broadcast relabel (q159's daily leg)
  * store must grow with the corpus; apply's only corpus-dependence is
  * the stored-table join (columnar scan, no iteration).
  *
  * Run ScaleProbe first (builds /tmp/graft_scale_20x), then:
  *   sbt "runMain graft.CcAddProbe"
  */
object CcAddProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    import graft.operators.Graph

    val scaled = "/tmp/graft_scale_20x"
    require(new java.io.File(s"$scaled/orders.parquet").exists(),
      "run graft.ScaleProbe first to build the 20x corpus")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val cutoff = lit(Graph.WarmCutoff).cast("timestamp")
    // fixed batch: sf0.1's post-cutoff delta aggregate, checkpointed so
    // both apply runs consume identical input
    val o1 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val l1 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val deltaW = Graph.ccPairWeights(
      o1.filter(col("o_orderdate") >= cutoff), l1).localCheckpoint()

    for ((tag, dir) <- Seq("1x" -> "/root/testdata/sf0.1", "20x" -> scaled)) {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val ((storedW, storedLabels), tStore) = time {
        val s = Graph.ccStore(orders.filter(col("o_orderdate") < cutoff),
          lineitem)
        s._1.count(); s._2.count() // materialize the store
        s
      }
      // untimed warm apply (JIT + codegen), then the timed one
      Graph.ccApply(storedW, storedLabels, deltaW)
        .write.mode("overwrite").format("noop").save()
      val (_, tApply) = time {
        Graph.ccApply(storedW, storedLabels, deltaW)
          .write.mode("overwrite").format("noop").save()
      }
      val nPairs = storedW.count()
      val nLabels = storedLabels.count()
      println(f"[ccadd] $tag%-3s store=$tStore%.2fs apply=$tApply%.2fs " +
        f"(stored pairs=$nPairs%d labels=$nLabels%d)")
    }
    spark.stop()
  }
}
