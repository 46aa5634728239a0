package graft

import graft.operators.{Corpus, Lexicon}
import graft.Tables.T
import org.apache.spark.sql.functions._

/** q187 — the multilingual token-currency pipeline: forced hand-corpus
  * verdicts (including the per-LANGUAGE stop-rule keying the flat
  * battery can't express) and budget-adherence invariants on the real
  * sf0.001 corpus. */
class TokenPipelineSpec extends SparkSpec {
  import spark.implicits._

  // The CorpusPipelineSpec clean() device: >= 50 words, alphabetic,
  // stopwords interleaved with per-doc tag words so texts with
  // different tags share no 7-gram.
  private val AaStops = Seq("the", "be", "to", "of", "and", "that",
    "have", "with")
  private def clean(tag: String): String =
    (AaStops.zipWithIndex.flatMap { case (s, i) => Seq(s"${tag}x$i", s) } ++
      (1 to 50).map(i => s"${tag}w$i")).mkString(" ")

  test("per-language stop keying and gate verdicts on a forced corpus") {
    // doc 2 carries doc 1's EXACT text but a different lang: it is the
    // content-hash dup AND fails the stop rule under ITS OWN language's
    // list — the same text, two verdicts, which is what per-language
    // keying means. doc 3's text twins eval doc 97 -> contaminated.
    val stops = Map("aa" -> AaStops, "bb" -> Seq("zz1", "zz2"))
    val bbClean = (Seq("zz1", "zz2").zipWithIndex.flatMap {
      case (s, i) => Seq(s"cx$i", s) } ++
      (1 to 50).map(i => s"cw$i")).mkString(" ")
    val docs = Seq(
      (1L, "aa", "s0", clean("a")),
      (2L, "bb", "s0", clean("a")),
      (3L, "bb", "s1", bbClean),
      (5L, "aa", "s1", clean("d")),
      (97L, "bb", "s1", bbClean)
    ).toDF("doc_id", "lang", "source", "text")
    val (merges, dict) = Corpus.bpeStore(docs, 2)
    val log = Corpus.tokenPipeline(docs, merges, dict, stops, seed = 187)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!log.contains(97L), "eval-split doc must stay out of the log")
    // (doc_id, lang, source, n_words, n_tokens, is_dup, quality_pass,
    //  contaminated, token_keep, survives, shard)
    assert(!log(1L).getBoolean(5) && log(1L).getBoolean(6),
      "doc 1: canonical and quality-clean under its own list")
    assert(log(2L).getBoolean(5), "doc 2 is the content-hash dup")
    assert(!log(2L).getBoolean(6),
      "doc 2: the SAME text fails the stop rule under lang bb's list")
    assert(log(3L).getBoolean(7), "doc 3 twins the eval doc -> contaminated")
    assert(log(5L).getBoolean(6) && !log(5L).getBoolean(7))
    log.values.foreach { r =>
      val gates = !r.getBoolean(5) && r.getBoolean(6) && !r.getBoolean(7)
      assert(r.getBoolean(9) == (gates && r.getBoolean(8)),
        s"doc ${r.getLong(0)}: survives must equal gates && token_keep")
      assert(r.isNullAt(10) != r.getBoolean(9),
        s"doc ${r.getLong(0)}: shard iff survives")
      if (r.getLong(4) == 0L)
        assert(!r.getBoolean(8), "a zero-token doc cannot carry budget")
    }
  }

  test("q187 on the real corpus: budgets realized over the gate " +
    "survivors within one document per cell") {
    val log = Lexicon.q187MultilexPipeline(
      T(spark, "/root/testdata/sf0.001")).cache()
    val pool = log.where(!col("is_dup") && col("quality_pass") &&
        !col("contaminated") && col("n_tokens") > 0)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        expr(operators.TextDedup.h60(187, "CAST(doc_id AS STRING)")).as("h"))
    val targets = Corpus.mixPlan(pool)
      .select("lang", "source", "mass_tokens", "target_tokens")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val kept = log.where(col("token_keep"))
      .groupBy("lang", "source")
      .agg(sum("n_tokens").as("kt"), max("n_tokens").as("mx"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(targets.nonEmpty)
    targets.foreach { case (cell, (mass, target)) =>
      val (kt, mx) = kept.getOrElse(cell, (0L, 0L))
      if (kt < target)
        assert(kt == mass,
          s"$cell under target only when the whole cell is kept")
      else
        assert(kt - mx < target,
          s"$cell kept mass must be within one document of its target")
    }
    // every kept doc passed the gates — the budget never resurrects a
    // gated-out document
    assert(log.where(col("token_keep") &&
      (col("is_dup") || !col("quality_pass") || col("contaminated")))
      .count() == 0L)
    log.unpersist()
  }
}
