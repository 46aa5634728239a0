package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** k_factor sensitivity for the q169 exact-rerank stage (scratch
  * tooling): sum(n_match_rerank) over the 10 planted queries as the
  * ADC shortlist grows — the "how big must the refinement shortlist
  * be" curve a store operator actually tunes (FAISS `k_factor`).
  *
  *   sbt "runMain graft.RerankSweep"                 # sf0.01 + sf0.1
  *   sbt "runMain graft.RerankSweep /root/testdata/sf0.1"
  */
object RerankSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) Seq(args(0))
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    for (d <- dirs) {
      val planted = graft.operators.Similarity
        .plantedEmbeddings(Tables.T(spark, d).embeddings)
      for (k <- Seq(0, 10, 20, 50, 100)) {
        val df = graft.operators.Similarity
          .ivfPqResidualMultiprobe(planted, 10, 3, 4, 8, 2, 2, 5, rerank = k)
        val col = if (k > 0) "n_match_rerank" else "n_match"
        val s = df.agg(sum(col)).head().getLong(0)
        println(s"[rerank] $d shortlist=$k sum($col)=$s / 50")
      }
    }
    spark.stop()
  }
}
