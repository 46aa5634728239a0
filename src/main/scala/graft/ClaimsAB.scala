package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: native claim_pcts vs the regexp composition over the q32
  * synthetic corpus (not part of the library surface). */
object ClaimsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables.T(spark, sfDir)
    val built = t.orders
      .withColumn("pct_int", col("o_orderkey") % 150)
      .withColumn("sentence",
        concat(lit("Studie: Zustimmung bei "), col("pct_int"), lit(",5 %"),
          lit(" (n = 6.063). Ablehnung bei 12,3 Prozent.")))
      .select("o_orderkey", "sentence")
    built.write.mode("overwrite").format("noop").save() // warm
    val pctRe = "(\\\\d+),(\\\\d+)\\\\s*(?:%|Prozent)"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ab] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    for (_ <- 1 to 3) {
      time("regex composition")(
        built.withColumn("v", expr(
          s"transform(regexp_extract_all(sentence, '$pctRe', 0), " +
            "m -> CAST(split(m, ',')[0] AS DOUBLE) + " +
            "CAST(split(split(m, ',')[1], '[^0-9]+')[0] AS DOUBLE) / 10)"))
          .write.mode("overwrite").format("noop").save())
      time("native claim_pcts  ")(
        built.withColumn("v", expr("claim_pcts(sentence)"))
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
