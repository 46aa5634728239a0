package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for q27/q28 (not part of the library
  * surface). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    val t = Tables.T(spark, sfDir)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val extra = r match { case n: Long => s" ($n rows)"; case _ => "" }
      println(f"[dedup] $label ${(System.nanoTime() - t0) / 1e9}%.3fs$extra")
    }
    time("docs count (cache fill)")(t.documents.count())
    val h60expr = graft.operators.TextDedup.h60(99, "w")
    for (rep <- 1 to 2) {
      val tok = t.documents
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      time(s"rep$rep tokenize only")(tok.count())
      val tokh = tok.withColumn("h", expr(h60expr))
      time(s"rep$rep tokenize+hash")(tokh.agg(max("h")).collect())
      val sums = tokh.groupBy("doc_id").agg(
        sum(when(expr(s"(h div 1) % 2") === 1, 1).otherwise(-1)).as("s0"),
        (1 until 60).map(b =>
          sum(when(expr(s"(h div ${1L << b}) % 2") === 1, 1).otherwise(-1))
            .as(s"s$b")): _*)
      time(s"rep$rep 60-bit sums agg")(sums.count())
      val sim = sums.select(col("doc_id"),
        (0 until 60).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
          .as("simhash"))
      val chunks = sim.select(
        col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('chunk', c, 'key', (simhash div CAST(pow(2, c * 15) AS BIGINT)) % 32768))")).as("ck"))
        .select(col("doc_id"), col("simhash"),
          col("ck.chunk").as("chunk"), col("ck.key").as("key"))
      val rawPairs = chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
      time(s"rep$rep q28 raw pair count")(rawPairs.count())
      time(s"rep$rep full q28")(
        graft.operators.TextDedup.q28Simhash(t)
          .write.mode("overwrite").format("noop").save())
      time(s"rep$rep full q27")(
        graft.operators.TextDedup.q27MinhashNearDup(t)
          .write.mode("overwrite").format("noop").save())
      val tok27 = t.documents
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 3), " +
            "i -> concat_ws(' ', words[i], words[i + 1], words[i + 2]))")).as("s"))
        .distinct()
      val shingleOnly = t.documents
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 3), " +
            "i -> concat_ws(' ', words[i], words[i + 1], words[i + 2]))")).as("s"))
      time(s"rep$rep q27 shingle build (no distinct)")(shingleOnly.count())
      time(s"rep$rep q27 tok distinct")(tok27.count())
      val tokCk = tok27.localCheckpoint(false)
      time(s"rep$rep q27 tok checkpoint")(tokCk.count())
      val hashed = tokCk.withColumn("hb",
        expr(s"(${graft.operators.TextDedup.h60(0, "s")}) % 2147483647"))
      val mhCols = (0 until 12).map(i =>
        min(expr(s"(hb * ${graft.operators.TextDedup.MinhashA(i)} + ${graft.operators.TextDedup.MinhashB(i)}) % 2147483647")).as(s"mh$i"))
      val minhashes = hashed.groupBy("doc_id")
        .agg(mhCols.head, (mhCols.tail :+ count(lit(1)).as("n")): _*)
      time(s"rep$rep q27 minhash agg")(minhashes.count())
    }
    spark.stop()
  }
}
