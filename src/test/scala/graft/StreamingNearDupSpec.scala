package graft

import java.sql.Timestamp

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._

/** q98 semantics: signature-identical docs collapse to the minimum
  * doc_id with attribution rows; distinct texts never collapse; parity
  * against the batch groupBy replay on the real corpus. */
class StreamingNearDupSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("sig", expr("minhash12(text).mh"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("sig"))
  }

  private def collectDups(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toList

  test("identical texts attribute to the minimum doc_id; distinct texts pass") {
    val out = collectDups(StreamingNearDup.streamDedup(spark, docs(Seq(
      (7L, "the quick brown fox jumps"),
      (3L, "the quick brown fox jumps"),
      (9L, "the quick brown fox jumps"),
      (5L, "an entirely different document body here")))))
    assert(out == List((7L, 3L), (9L, 3L)))
  }

  test("documents with fewer than 3 words carry no signature and are excluded") {
    val in = docs(Seq((1L, "two words"), (2L, "two words"), (3L, "now three words")))
    assert(in.count() == 1) // only doc 3 survives the null-sig filter
    assert(collectDups(StreamingNearDup.streamDedup(spark, in)).isEmpty)
  }

  test("stream/batch parity on the corpus") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val streamed = collectDups(StreamingNearDup.q98StreamingNearDup(t))
    val batch = t.documents
      .withColumn("sig", expr("minhash12(text).mh"))
      .filter(col("sig").isNotNull)
      .groupBy("sig").agg(min("doc_id").as("dup_of"),
        collect_list("doc_id").as("ids"))
      .select(col("dup_of"), explode(col("ids")).as("doc_id"))
      .filter(col("doc_id") > col("dup_of"))
      .select("doc_id", "dup_of")
      .orderBy("doc_id")
    assert(collectDups(batch.select("doc_id", "dup_of")) == streamed)
    assert(streamed.nonEmpty)
  }
}
