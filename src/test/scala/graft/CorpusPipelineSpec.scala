package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** The q133 composed corpus build: a hand corpus where each stage's
  * verdict is forced, plus whole-log internal-consistency invariants on
  * the real table. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // A long clean text that passes every Gopher rule (>= 50 words with
  // stopwords, alphabetic, no symbols). The stopwords are INTERLEAVED
  // with per-doc tag words so every 7-gram window contains a tag word —
  // texts with different tags share no 7-gram, and contamination can
  // come only from an exact text twin.
  private def clean(tag: String): String = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    (stops.zipWithIndex.flatMap { case (s, i) => Seq(s"${tag}x$i", s) } ++
      (1 to 50).map(i => s"${tag}w$i")).mkString(" ")
  }

  test("each stage's verdict on a forced hand corpus") {
    // eval doc: id 97 (97 % 97 == 0) shares its text with train doc 3
    // -> doc 3 is contaminated (same 7-grams). Docs 1 and 2 duplicate
    // each other -> 2 is the dup (1 is canonical). Doc 4 is low-quality
    // (short). Doc 5 is clean and unique.
    val docs = Seq(
      (1L, "en", clean("a")),
      (2L, "en", clean("a")),
      (3L, "en", clean("c")),
      (4L, "en", "too short"),
      (5L, "de", clean("d")),
      (97L, "en", clean("c"))
    ).toDF("doc_id", "lang", "text").withColumn("n_chars", length(col("text")))
    val log = Corpus.corpusPipeline(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
          r.getBoolean(7))).toMap
    // (is_dup, quality_pass, contaminated, mixture_keep, survives)
    assert(!log.contains(97L), "eval doc must not appear in the train log")
    assert(!log(1L)._1 && log(2L)._1, "min doc_id is canonical, twin is dup")
    // doc 3 is a dup of eval doc 97? No - dedup runs over ALL docs
    // including eval; 3 < 97 so 3 stays canonical
    assert(!log(3L)._1)
    assert(log(3L)._3, "doc sharing eval text must be contaminated")
    assert(!log(5L)._3 && !log(1L)._3)
    assert(!log(4L)._2, "short doc fails quality")
    assert(log(1L)._2 && log(5L)._2)
    log.foreach { case (id, (dup, q, cont, mix, surv)) =>
      assert(surv == (!dup && q && !cont && mix), s"doc $id")
    }
  }

  test("stop-list parameter (q178): with stops given, quality_pass " +
    "requires >= 2 of them; without, the stop rule is skipped") {
    // clean("a") interleaves the eight GOPHER stopwords — so with a
    // CUSTOM list it contains none of them, and the full battery must
    // reject it while the default four-rule battery accepts it.
    val docs = Seq(
      (1L, "en", clean("a")),
      (2L, "en", clean("b") + " zkq1 zkq2") // carries 2 custom stops
    ).toDF("doc_id", "lang", "text").withColumn("n_chars", length(col("text")))
    val custom = Some(Seq("zkq1", "zkq2"))
    val withStop = Corpus.corpusPipeline(docs, custom)
      .select("doc_id", "quality_pass").as[(Long, Boolean)].collect().toMap
    assert(!withStop(1L), "no custom stop words -> full battery rejects")
    assert(withStop(2L), "2 custom stops -> full battery accepts")
    val without = Corpus.corpusPipeline(docs)
      .select("doc_id", "quality_pass").as[(Long, Boolean)].collect().toMap
    assert(without(1L) && without(2L), "four-rule battery accepts both")
  }

  test("whole-log invariants on the real table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val log = Corpus.corpusPipeline(docs).cache()
    try {
      // survives is exactly the conjunction; shard present iff survives
      assert(log.filter(col("survives") =!=
        (!col("is_dup") && col("quality_pass") && !col("contaminated") &&
          col("mixture_keep"))).count() == 0)
      assert(log.filter(col("survives") && col("shard").isNull).count() == 0)
      assert(log.filter(!col("survives") && col("shard").isNotNull).count() == 0)
      assert(log.filter(col("shard") < 0 || col("shard") > 7).count() == 0)
      // every dup has a smaller-id twin with identical text
      val dups = log.filter(col("is_dup")).select("doc_id")
        .join(docs, "doc_id").select(col("doc_id"), col("text"))
      val twinless = dups.as("d").join(docs.as("o"),
          col("o.text") === col("d.text") && col("o.doc_id") < col("d.doc_id"),
          "left_anti")
      assert(twinless.count() == 0, "a dup without a smaller identical twin")
      // no eval docs in the log
      assert(log.filter(col("doc_id") % 97 === 0).count() == 0)
    } finally log.unpersist()
  }
}
