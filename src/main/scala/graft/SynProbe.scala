package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r18 optimization round): where does a lex-corpus
  * synthesis pass spend its time? Times, at sf0.1 over the documents
  * table (min of 3 after warm):
  *   full      — multiLexDocuments → noop (the pass every lex query pays)
  *   hashes    — per-position h60 chain only (md5→hex→substring→conv)
  *   hashesUdf — same values via a JVM closure computing the 60-bit
  *               value straight from the digest bytes (what a native
  *               fused expression could achieve; UDF overhead makes this
  *               a LOWER bound on the native win)
  *   spellOnly — the full derivation with the hash replaced by a cheap
  *               arithmetic stand-in (isolates spelling/array cost)
  */
object SynProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = HarnessTuning(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Lexicon

    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "source")
    docs.count()

    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val s = (1 to 3).map(_ => once()).min
      println(f"[synprobe] $label%-10s $s%.3f s")
    }

    t("full") { docs.withColumn("text",
      expr(Lexicon.multiLexTextSparkSql)) }

    val nw = "(8 + h0 % 93 + (CASE WHEN (h0 DIV 128) % 20 = 0" +
      " THEN (h0 DIV 4096) % 400 ELSE 0 END))"
    val h60 = "CAST(conv(substring(md5(concat('1760:', CAST(doc_id AS " +
      "STRING), ':', CAST(p AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    t("hashes") { docs
      .withColumn("h0", expr("CAST(conv(substring(md5(concat('176:', " +
        "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("hs", expr(
        s"aggregate(transform(sequence(0L, $nw - 1L), p -> $h60), " +
          "0L, (a, x) -> a ^ x)")) }

    val udfH = udf { (docId: Long, n: Int) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      var a = 0L
      var p = 0
      while (p < n) {
        val d = md.digest(s"1760:$docId:$p".getBytes("UTF-8"))
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
        a ^= (v >>> 4)
        md.reset()
        p += 1
      }
      a
    }
    t("hashesUdf") { docs
      .withColumn("h0", expr("CAST(conv(substring(md5(concat('176:', " +
        "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("hs", udfH(col("doc_id"), expr(nw).cast("int"))) }

    // spelling cost with a cheap hash stand-in (xxhash64 is native/fast)
    val cheap = Lexicon.multiLexTextSparkSql.replace(
      "CAST(conv(substring(md5(", "CAST(abs(xxhash64((")
      .replace(")), 1, 15), 16, 10) AS BIGINT)", "))) AS BIGINT)")
    t("spellOnly") { docs.withColumn("text", expr(cheap)) }

    spark.stop()
  }
}
