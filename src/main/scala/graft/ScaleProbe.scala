package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 20× scale probe (scratch tooling, not part of the library surface).
  *
  * Synthesizes a 20×-document corpus from sf0.1 with per-copy token
  * variation (each copy perturbs its text so near-dup families still
  * have real work to do, not 20 exact clones), copies the other tables
  * unchanged, then times the named queries against sf0.1 and the scaled
  * dir. The interesting number is the GROWTH FACTOR per query — a
  * banded/blocked/prefix-filtered family should grow roughly linearly
  * in rows (plus candidate-density effects), never quadratically.
  *
  *   sbt "runMain graft.ScaleProbe q67_clusters_at_scale,q27_minhash_neardup"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q67_clusters_at_scale", "q27_minhash_neardup",
        "q28_simhash", "q70_ngram_jaccard")
    val factor = if (args.length > 1) args(1).toInt else 20
    val base = "/root/testdata/sf0.1"
    val scaled = s"/tmp/graft_scale_${factor}x"
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

    if (!new java.io.File(s"$scaled/documents.parquet").exists()) {
      new java.io.File(scaled).mkdirs()
      // 20 copies per doc; copy 0 keeps the original text, the others get
      // a copy-tagged token swapped in every ~7th word so shingle /
      // minhash / bigram families see near-dups, not exact clones.
      spark.read.parquet(s"$base/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .crossJoin(spark.range(factor).select(col("id").as("copy")))
        .select(
          (col("doc_id") * factor + col("copy")).as("doc_id"),
          when(col("copy") === 0, col("text")).otherwise(
            array_join(
              zip_with(
                split(col("text"), " "),
                sequence(lit(0), size(split(col("text"), " ")) - 1),
                (w, i) => when(i % 7 === col("copy") % 7 && i > 0,
                  concat(w, lit("v"), col("copy"))).otherwise(w)),
              " ")).as("text"),
          col("lang"), col("source"),
          length(col("text")).as("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
      // embeddings scale the same way for the ANN families: jitter one
      // deterministic dimension per copy so vectors stay near-dups.
      spark.read.parquet(s"$base/embeddings.parquet")
        .crossJoin(spark.range(factor).select(col("id").as("copy")))
        .select(
          (col("vec_id") * factor + col("copy")).as("vec_id"),
          col("label"),
          transform(col("embedding"),
            (v, i) => when(i === col("copy") % 8, v * lit(1.001f)).otherwise(v))
            .as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      // events/orders scale too (r11): the corpus-synthesis families read
      // them (q32 claims ← orders; q53 parse + q82 compaction ← events),
      // so a 20× probe of those paths needs 20× base rows. New unique ids
      // per copy; ts keeps its value so q82's (ts DESC, event_id DESC)
      // total order stays total via the id tie-break.
      spark.read.parquet(s"$base/events.parquet")
        .crossJoin(spark.range(factor).select(col("id").as("copy")))
        .select((col("event_id") * factor + col("copy")).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/events.parquet")
      spark.read.parquet(s"$base/orders.parquet")
        .crossJoin(spark.range(factor).select(col("id").as("copy")))
        .select((col("o_orderkey") * factor + col("copy")).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/orders.parquet")
      // lineitem scales WITH orders under the same key transform, so the
      // orders ⋉ lineitem joins (q10/q21-q23/q38 staging, …) stay
      // referentially intact at the scaled dir: copy c of order k joins
      // exactly copy c of its lines. Without this, rekeyed orders against
      // unscaled l_orderkey values made any join-bearing probe target
      // silently meaningless.
      val liCols = spark.read.parquet(s"$base/lineitem.parquet").columns
      spark.read.parquet(s"$base/lineitem.parquet")
        .crossJoin(spark.range(factor).select(col("id").as("copy")))
        .select((col("l_orderkey") * factor + col("copy")).as("l_orderkey") +:
          liCols.filter(_ != "l_orderkey").map(col): _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/lineitem.parquet")
      for (t <- Tables.names
           if t != "documents" && t != "embeddings" && t != "events" &&
             t != "orders" && t != "lineitem") {
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$scaled/$t.parquet")
      }
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def best(n: String, dir: String, reps: Int): Double = {
      noop(SparkEntry.queries(n)(spark, dir)) // warm
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(n)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    for (n <- names) {
      val b = best(n, base, 3)
      val s = best(n, scaled, 2)
      // output rows at both scales: splits wall growth into genuine
      // output growth (near-dup TRUE pairs grow ~copies² by construction
      // — the probe's documented caveat) vs join-shape failure
      val rb = SparkEntry.queries(n)(spark, base).count()
      val rs = SparkEntry.queries(n)(spark, scaled).count()
      println(f"[scale] $n base=${b}%.2fs ${factor}x=${s}%.2fs growth=${s / b}%.1fx " +
        f"rows $rb%d -> $rs%d (${rs.toDouble / math.max(rb, 1)}%.0fx)")
    }
    spark.stop()
  }
}
