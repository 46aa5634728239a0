package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The q128 CCNet-style bigram-LM perplexity filter: hand-computed
  * probabilities on a tiny corpus (seen-bigram path AND add-one backoff
  * path), the micro-nat integer contract, and partition-count
  * determinism of the full pipeline on the real table. */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  // train doc (id 0, even): "a b a b a c" -> bigrams ab, ba, ab, ba, ac
  // score doc (id 1, odd):  "a b a d"     -> bigrams ab, ba, ad
  private def tiny = Seq(
    (0L, "en", "a b a b a c", 11L),
    (1L, "en", "a b a d", 7L)
  ).toDF("doc_id", "lang", "text", "n_chars")

  test("hand-computed stupid-backoff probabilities on a tiny corpus") {
    val row = TextAnalysis.perplexityFilter(tiny).head()
    assert(row.getLong(0) == 1L)        // doc_id
    assert(row.getLong(2) == 3L)        // n_bigrams
    assert(row.getLong(3) == 1L)        // n_backoff: only "a d" unseen
    // train LM: c(a,b)=2, c(a,c)=1, c(b,a)=2; ctx c(a·)=3, c(b·)=2
    // unigram over train tokens: a=3, b=2, c=1 -> N=6, V=3
    // p(ab)=2/3, p(ba)=2/2=1, p(ad)=0.4*(0+1)/(6+3)
    val pAb = 2.0 / 3.0
    val pBa = 1.0
    val pAd = 0.4 * (0.0 + 1.0) / (6.0 + 3.0)
    val nllMicro = Seq(pAb, pBa, pAd)
      .map(p => math.round(-math.log(p) * 1000000.0)).sum
    assert(row.getLong(4) == nllMicro, s"nll_micro ${row.getLong(4)} != $nllMicro")
    val ppl = BigDecimal(math.exp(nllMicro.toDouble / 1000000.0 / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(5) == ppl)
  }

  test("only odd doc_ids are scored and short docs are excluded") {
    val docs = Seq(
      (0L, "en", "a b c", 5L),
      (1L, "en", "a b", 3L),
      (2L, "en", "b c a", 5L),
      (3L, "en", "x", 1L),     // single token: excluded by the >= 2 contract
      (5L, "en", "c a b", 5L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val got = TextAnalysis.perplexityFilter(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
  }

  test("nll_micro is exact-integer stable across partition counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = TextAnalysis.perplexityFilter(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5))).toMap
    val got = TextAnalysis.perplexityFilter(docs.repartition(13))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(base == got)
  }
}
