package graft

import graft.operators.{Corpus, Lexicon}
import org.apache.spark.sql.functions._

/** q188 — the stateless ingestion-time token meter: agreement with the
  * batch encode-against-store accounting (per-occurrence merge-chain
  * application equals the vocabulary-collapse + dictionary path), and
  * the zero-encodable-document contract. */
class TokenMeterSpec extends SparkSpec {
  import spark.implicits._

  test("the meter aggregated to cells equals bpeEncodeAgainstStore") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (merges, dict) = Corpus.bpeStore(Lexicon.multiLexBase(docs), 8)
    val delta = Lexicon.multiLexDelta(docs)
    val store = Corpus.bpeEncodeAgainstStore(merges, dict, delta)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))).toMap
    // (lang, source) -> (n_docs, n_words, n_skipped_words, n_tokens);
    // the batch leg drops cells with no encodable words, so the meter
    // side keeps only cells with clean-word mass
    val meter = Corpus.bpeTokenMeter(merges, delta)
      .groupBy("lang", "source")
      .agg(sum(when(col("n_words") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_skipped_words").as("n_skipped"),
        sum("n_tokens").as("n_tokens"))
      .where(col("n_words") > 0)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(meter.nonEmpty && meter == store,
      s"meter cells ${meter.size} vs store cells ${store.size}")
  }

  test("a document with nothing encodable still meters (0, k, 0)") {
    val train = Seq(("aa", "hello world hello")).toDF("lang", "text")
    val (merges, _) = Corpus.bpeStore(train, 2)
    val batch = Seq(
      (1L, "aa", "s0", "hello world"),
      (2L, "aa", "s0", "a|b c\\d")
    ).toDF("doc_id", "lang", "source", "text")
    val rows = Corpus.bpeTokenMeter(merges, batch)
      .orderBy("doc_id").collect()
    assert(rows.length == 2, "the meter never drops a document")
    assert(rows(1).getLong(3) == 0L && rows(1).getLong(4) == 2L &&
      rows(1).getLong(5) == 0L)
    assert(rows(0).getLong(3) == 2L && rows(0).getLong(4) == 0L &&
      rows(0).getLong(5) > 0L)
  }
}
