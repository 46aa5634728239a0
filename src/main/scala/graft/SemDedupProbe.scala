package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup scaled-k probe (scratch tooling, not part of the library
  * surface) — closes q117's documented probe caveat: the 20× COVERAGE
  * probe holds the cluster count fixed (the table's label column), so
  * within-cluster pair volume grows ~copies² and the wall curve says
  * nothing about the paper's actual design point, which SCALES k with
  * the corpus so per-cluster size — and therefore per-cluster n² — stays
  * constant (Abbas et al. 2023 §3: k is the knob that caps cluster
  * size).
  *
  * Leg A replays q117's fixed-k shape at 1× and 20×. Leg B blocks the
  * same ε-ball survivor semantics by a k-means-style coarse quantizer
  * whose k grows 20× with the corpus (hash-seeded centroids — the
  * q142/q143 seeding rule; refinement quality is irrelevant to the
  * VOLUME property under probe), so per-cluster candidate work is flat
  * and the wall should track rows ~linearly. Assignment at probe-k
  * (200) runs as one mapPartitions pass over a driver-held centroid
  * matrix (k·d ≈ 100 KB — probe-local stand-in for the q143 IVF index
  * a production corpus would already have).
  *
  *   sbt "runMain graft.ScaleProbe q117_semdedup"   # builds the 20x dir
  *   sbt "runMain graft.SemDedupProbe"
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val scaled = "/tmp/graft_scale_20x"
    require(new java.io.File(s"$scaled/embeddings.parquet").exists(),
      s"run graft.ScaleProbe first to synthesize $scaled")
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

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    /** ε-ball survivor pass blocked by a scaled-k coarse quantizer. */
    def kBlocked(dir: String, k: Int): DataFrame = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      // hash-seeded centroid matrix on the driver (k·d doubles)
      val seedIds = emb.select(col("vec_id"))
        .withColumn("h", expr(operators.TextDedup.h60(143, "CAST(vec_id AS STRING)")))
        .orderBy("h", "vec_id").limit(k).collect().map(_.getLong(0))
      val cent = emb.filter(col("vec_id").isin(seedIds: _*))
        .select("vec_id", "vec").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val mat = seedIds.map(cent)
      val bc = spark.sparkContext.broadcast(mat)
      import spark.implicits._
      val assigned = emb.select("vec_id", "vec").as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val m = bc.value
          it.map { case (id, v) =>
            var bestC = 0; var bestD = Double.MaxValue
            var j = 0
            while (j < m.length) {
              var d = 0.0; var i = 0
              while (i < v.length) {
                val x = v(i) - m(j)(i); d += x * x; i += 1
              }
              if (d < bestD) { bestD = d; bestC = j }
              j += 1
            }
            (id, bestC, v)
          }
        }.toDF("vec_id", "cluster", "vec")
      val b = assigned.select(col("vec_id").as("id_b"),
        col("cluster"), col("vec").as("vb"))
      assigned.join(b, Seq("cluster"))
        .filter(col("id_b") < col("vec_id"))
        .withColumn("cosine", expr("vec_dot(vec, vb)") /
          (sqrt(expr("vec_dot(vec, vec)")) * sqrt(expr("vec_dot(vb, vb)"))))
        .filter(col("cosine") >= 0.99)
        .groupBy("vec_id").agg(min("id_b").as("dup_of"))
    }

    // Leg A: the declared fixed-k q117 at both scales
    for (dir <- Seq(base, scaled)) {
      noop(SparkEntry.queries("q117_semdedup")(spark, dir)) // warm
      val t = (1 to 3).map(_ => time(
        noop(SparkEntry.queries("q117_semdedup")(spark, dir)))).min
      println(f"[semdedup] fixed-k dir=$dir wall=$t%.2fs")
    }
    // Leg B: k scales with the corpus (10 -> 200), per-cluster size flat
    for ((dir, k) <- Seq((base, 10), (scaled, 200))) {
      noop(kBlocked(dir, k)) // warm
      val t = (1 to 3).map(_ => time(noop(kBlocked(dir, k)))).min
      val drops = kBlocked(dir, k).count()
      println(f"[semdedup] scaled-k dir=$dir k=$k wall=$t%.2fs drops=$drops")
    }
    spark.stop()
  }
}
