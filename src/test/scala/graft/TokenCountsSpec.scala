package graft

import org.apache.spark.sql.functions._

/** Pins `token_counts` (native q76 histogram) against the
  * split/explode/groupBy composition it replaces, on the real documents
  * corpus and an edge matrix (blank text, runs of mixed whitespace,
  * unicode, case folding). */
class TokenCountsSpec extends SparkSpec {

  private def viaComposition(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
    .groupBy("id", "w").agg(count(lit(1)).as("n_occ"))

  private def viaNative(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), explode(expr("token_counts(text)")).as(Seq("w", "n_occ")))

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = viaComposition(df).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val b = viaNative(df).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("edge matrix: blank, whitespace runs, unicode, case") {
    import spark.implicits._
    assertSame(Seq(
      (1L, "a b  c\t\td\ne a a"),
      (2L, ""),
      (3L, "   \t \n "),
      (4L, "  leading and trailing  "),
      (5L, "Mixed CASE mixed case MIXED"),
      (6L, "umlauts ÄÖÜ ärger STRASSE ß"),
      (7L, "xvtab\ffeed\rcr"),
      (8L, "single"),
      (9L, "\tresidual tab edges\t"),
      (10L, "\n\nnewline edges\r\r"),
      (11L, " \t space then tab \t ")).toDF("id", "text"))
  }

  test("documents corpus: histogram equals composition") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
    assertSame(docs)
  }
}
