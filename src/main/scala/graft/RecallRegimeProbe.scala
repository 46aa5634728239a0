package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall panorama across embedding-geometry regimes (scratch tooling):
  * the SAME residual IVF-PQ pipeline (q160/q165's code and parameters)
  * measured on three corpora that differ only in where their similarity
  * mass lives, so the planted corpus's regime choice is a measured
  * decision, not an assertion:
  *
  *  - ISOTROPIC: the real synthetic embeddings table — uniform random
  *    vectors, PQ's information-theoretic worst case (no structure for
  *    codes to spend bits on; recall ≈ chance).
  *  - MANIFOLD: clusters ±1000 plus a GLOBAL low-rank (2-D) in-cluster
  *    tier — a_i·u + b_i·v at ±200 with micro ±10, the "embeddings on
  *    a low-dimensional manifold" regime real corpora approximate.
  *    Codes can learn the plane but near-ties along it still blur.
  *  - PRODUCT: the q164–q169 planted corpus — independent per-subspace
  *    groups, the regime PQ's independence assumption models exactly.
  *
  *   sbt "runMain graft.RecallRegimeProbe"        # sf0.01
  */
object RecallRegimeProbe {
  /** Cluster tier ±1000 + global 2-D manifold tier (coefficients a, b
    * per vector; directions u, v per dimension; all from the portable
    * md5 hash, integer arithmetic with nonneg operands before DIV) +
    * micro ±10, through the same exact float roundtrip contract as
    * plantedEmbeddings (|m| ≤ 1000 + 2·~200 + 10 < 1500 ⇒ exact). */
  private def manifoldEmbeddings(ids: DataFrame): DataFrame = {
    def h(tag: String, args: String) =
      s"CAST(conv(substring(md5(concat('$tag:', $args)), 1, 15), 16, 10) AS BIGINT)"
    ids.select(col("vec_id"),
      (col("vec_id") % 10).cast("int").as("label"),
      expr(
        s"""transform(sequence(0, 63), d -> CAST(CAST(
           |  ${h("pc", "CAST(vec_id % 10 AS STRING), ':', CAST(d AS STRING)")}
           |    % 2001 - 1000 +
           |  ((${h("pa", "CAST(vec_id AS STRING)")} % 201)
           |    * (${h("pu", "CAST(d AS STRING)")} % 201)) DIV 100 - 200 +
           |  ((${h("pb", "CAST(vec_id AS STRING)")} % 201)
           |    * (${h("pv", "CAST(d AS STRING)")} % 201)) DIV 100 - 200 +
           |  ${h("pj", "CAST(vec_id AS STRING), ':', CAST(d AS STRING)")}
           |    % 21 - 10
           |  AS DOUBLE) / 1000.0D AS FLOAT))""".stripMargin).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    val emb = Tables.T(spark, sfDir).embeddings
    val ids = emb.select("vec_id")
    val corpora = Seq(
      "isotropic" -> emb,
      "manifold" -> manifoldEmbeddings(ids),
      "product" -> graft.operators.Similarity.plantedEmbeddings(ids))
    for ((tag, corpus) <- corpora) {
      val df = graft.operators.Similarity
        .ivfPqResidual(corpus, 10, 3, 4, 8, 2, 5)
      val s = df.agg(sum("n_match")).head().getLong(0)
      println(s"[regime] $sfDir $tag residual-PQ recall sum(n_match)=$s / 50")
    }
    spark.stop()
  }
}
