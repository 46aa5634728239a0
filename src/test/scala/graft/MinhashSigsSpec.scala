package graft

import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Pins `minhash12` / `shingle_jaccard` (the native q27 stages) against
  * the exact SQL composition they replaced: shingle explode + distinct +
  * md5 base hash + 12 affine mins, and the counting-join Jaccard. Runs on
  * the real documents corpus plus an edge matrix. */
class MinhashSigsSpec extends SparkSpec {

  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val tok = df
      .select(col("id"), split(trim(col("text")), "\\s+").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("id"), explode(expr(
        "transform(sequence(0, size(words) - 3), " +
          "i -> concat_ws(' ', words[i], words[i + 1], words[i + 2]))")).as("s"))
      .distinct()
    val hashed = tok.withColumn("hb",
      expr(s"${TextDedup.h60(0, "s")} % 2147483647"))
    val mhCols = (0 until 12).map(i =>
      min(expr(s"(hb * ${TextDedup.MinhashA(i)} + ${TextDedup.MinhashB(i)}) % 2147483647"))
        .as(s"mh$i"))
    hashed.groupBy("id").agg(mhCols.head, (mhCols.tail :+ count(lit(1)).as("n")): _*)
  }

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = composed(df).collect()
      .map(r => (r.getLong(0), (0 until 12).map(i => r.getLong(i + 1)).toList, r.getLong(13)))
      .sortBy(_._1)
    val b = df.select(col("id"), expr("minhash12(text)").as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), col("sig.mh"), col("sig.n"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getInt(2).toLong))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("minhash12 matches the explode/distinct/md5/agg composition on documents") {
    assertParity(Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text")))
  }

  test("minhash12 edge matrix: short texts, repeats, ws edges") {
    import spark.implicits._
    assertParity(Seq(
      (1L, "one two three four"),
      (2L, "one two"),              // < 3 words → NULL, absent both sides
      (3L, ""),
      (4L, "a a a a a"),            // one distinct shingle
      (5L, "\tx y z w\n"),          // non-space ws edges → empty edge tokens
      (6L, "dup dup dup dup dup dup"),
      (7L, "ä ö ü ß multi byte glyphs here")).toDF("id", "text"))
  }

  test("simhash60 matches the explode + 60-sum aggregate composition") {
    def composedSim(df: org.apache.spark.sql.DataFrame) = {
      val tok = df.select(col("id"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .withColumn("h", expr(TextDedup.h60(99, "w")))
      val sums = tok.groupBy("id").agg(
        sum(when(expr(s"(h div ${1L << 0}) % 2") === 1, 1).otherwise(-1)).as("s0"),
        (1 until 60).map(b =>
          sum(when(expr(s"(h div ${1L << b}) % 2") === 1, 1).otherwise(-1))
            .as(s"s$b")): _*)
      sums.select(col("id"),
        (0 until 60).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
          .as("simhash"))
    }
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(Seq(
        (100001L, ""), (100002L, "   "), (100003L, "\tx y\n"),
        (100004L, "a"), (100005L, "dup dup dup")).toDF("id", "text"))
    val a = composedSim(docs).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = docs.select(col("id"), expr("simhash60(text)")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("shingle_jaccard equals the counting-join value on document pairs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    import spark.implicits._
    val pairs = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib && ib < ia + 5
    } yield (ia, ta, ib, tb)).toSeq.toDF("ia", "text_a", "ib", "text_b")
    def shingleSet(s: String): Set[String] = {
      val w = s.trim.split("\\s+", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val out = pairs
      .withColumn("native", expr("shingle_jaccard(text_a, text_b)"))
      .collect()
    out.foreach { r =>
      val (sa, sb) = (shingleSet(r.getString(1)), shingleSet(r.getString(3)))
      val expected =
        if (sa.isEmpty || sb.isEmpty) 0.0
        else (sa & sb).size.toDouble / (sa.size + sb.size - (sa & sb).size)
      assert(r.getDouble(r.fieldIndex("native")) == expected,
        s"pair ${r.getLong(0)}-${r.getLong(2)}")
    }
  }
}
