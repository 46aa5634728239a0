package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q150 incremental-IVF cost probe (scratch tooling, not library
  * surface): shows the ADD path's cost tracks the BATCH, not the
  * corpus — the claim that makes incremental index maintenance worth
  * running instead of a nightly rebuild.
  *
  * Fixed 200-vector batch against a 1× (sf0.1, 2 000 vectors) and a
  * 20× (40 000) base corpus:
  *   - train  = Lloyd over the base (the rebuild path's dominant cost)
  *   - index  = assign the base corpus to lists (rest of the rebuild)
  *   - add    = quantize + assign THE BATCH against the frozen
  *              centroids + the k-sized delta aggregate (q150's add leg)
  * train+index must grow with the corpus; add must stay flat (its only
  * corpus-dependence is the k·d literal centroids).
  *
  * Run ScaleProbe first (builds /tmp/graft_scale_20x), then:
  *   sbt "runMain graft.IvfAddProbe"
  */
object IvfAddProbe {
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
    import graft.operators.Similarity

    val scaled = "/tmp/graft_scale_20x/embeddings.parquet"
    require(new java.io.File(scaled).exists(),
      "run graft.ScaleProbe first to build the 20x corpus")
    val base1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val base20 = spark.read.parquet(scaled)
    // fixed batch: 200 vectors, ids shifted out of both corpora's range
    val batch = base1.orderBy("vec_id").limit(200)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("label"),
        col("embedding"))
      .localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for ((name, corpus) <- Seq(("1x", base1), ("20x", base20))) {
      // warm + measure train (Lloyd is eager: collects per round)
      Similarity.lloyd(corpus, 10, 3)
      val (st, trainS) = time(Similarity.lloyd(corpus, 10, 3))
      def buildIndex() = {
        val idx = Similarity.assignCols(st.qframe, st.ca, st.d, st.k)
          .select(col("vec_id"), col("cluster")).localCheckpoint(false)
        idx.count() // materialize
        idx
      }
      buildIndex()
      val (_, indexS) = time(buildIndex())
      def addLeg() =
        Similarity.assignCols(Similarity.quantized(batch), st.ca, st.d, st.k)
          .groupBy("cluster").agg(count(lit(1))).collect()
      addLeg()
      val addS = (1 to 3).map(_ => time(addLeg())._2).min
      println(f"[ivfadd] $name train=$trainS%.2fs index=$indexS%.2fs " +
        f"add=$addS%.3fs (batch=200 rows, corpus=${corpus.count()}%d)")
    }
    spark.stop()
  }
}
