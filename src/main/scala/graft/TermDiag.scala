package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Scratch diagnostic: term-frequency distribution of the q67 prefix
  * index — which terms drive the candidate-pair quadratic. */
object TermDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qs = docs
      .withColumn("question",
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 6), " "))
      .groupBy("question").agg(min(col("doc_id").cast("long")).as("qid"))
    val terms = qs.select(col("qid"), col("question")).as[(Long, String)]
      .flatMap { case (qid, q) =>
        Clustering.questionVector(q).map { case (t, w) => (qid, t, w) } }
      .toDF("qid", "term", "w")
    val tf = terms.groupBy("term").agg(count(lit(1)).as("tf"))
    val thr = Clustering.ClusterThreshold
    val wTail = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("tf").desc, col("term").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val prefixIdx = terms.join(tf, Seq("term"))
      .withColumn("tail_sq", sum(col("w") * col("w")).over(wTail))
      .withColumn("norm_sq", sum(col("w") * col("w"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("qid")))
      .filter(col("tail_sq") > lit(thr * thr) * col("norm_sq") - lit(1e-9))
    val dist = prefixIdx.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
    println("=== top prefix terms by index count (n^2 drives candidates) ===")
    dist.limit(25).collect().foreach(r =>
      println(f"${r.getString(0)}%-20s n=${r.getLong(1)}%6d  pairs~${r.getLong(1) * r.getLong(1) / 2}%10d"))
    val tot = dist.select(sum(col("n") * col("n") / 2)).as[Double].first()
    println(f"sum n^2/2 = $tot%.0f")
    val nvec = terms.groupBy("qid")
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("vec"))
      .select(countDistinct(col("vec"))).first().getLong(0)
    println(s"distinct questions = ${qs.count()}, distinct vectors = $nvec")
    val distinctQs = qs.orderBy("qid").select("question").as[String].collect().toSeq
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val ids = Clustering.clusterQuestions(distinctQs)
      println(f"greedy clusterQuestions(${distinctQs.size}) rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs nclusters=${ids.max + 1}")
    }
    spark.stop()
  }
}
