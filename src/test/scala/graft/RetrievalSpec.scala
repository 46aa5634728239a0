package graft

import graft.operators.Retrieval

/** q85 semantics on hand-built corpora (the oracle pins the real corpus;
  * this pins the rules): hand-computed BM25 scores, idf ordering, no-hit
  * exclusion, case folding, top-k cut — plus the q118 RRF fusion rules
  * (per-leg rank contributions, absent-leg zero, leg-cut exclusion). */
class RetrievalSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], terms: Seq[String], limit: Int = 20) = {
    import spark.implicits._
    Retrieval.bm25(rows.toDF("doc_id", "text"), terms, limit)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toList
  }

  /** Reference BM25 for one term, mirroring the documented formula —
    * including HALF_UP rounding (Spark's round), not rint's HALF_EVEN. */
  private def score(tf: Double, df: Double, n: Double, dl: Double, avgdl: Double): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val s = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("single-term corpus matches the hand-computed formula") {
    // three docs, term 'cat' with tf 2, 1, 0; dl 4, 2, 3; avgdl 3, N 3, df 2
    val out = run(Seq(
      (1L, "cat dog cat bird"),
      (2L, "cat fish"),
      (3L, "dog bird fish")), Seq("cat"))
    // doc 1: tf 2 vs length penalty dl 4/avgdl 3 → 4.4/3.5 ≈ 1.257·idf
    // doc 2: tf 1, dl 2 → 2.2/1.9 ≈ 1.158·idf — tf wins
    assert(out.map(_._1) == List(1L, 2L))
    assert(out(0)._2 == score(2, 2, 3, 4, 3))
    assert(out(1)._2 == score(1, 2, 3, 2, 3))
    assert(out.forall(_._3 == 1))
  }

  test("rarer terms score higher at equal tf and dl") {
    val byDoc = run(Seq(
      (1L, "rare filler filler"),
      (2L, "hot filler filler"),
      (3L, "hot filler filler")), Seq("rare", "hot"))
    val s = byDoc.map(t => t._1 -> t._2).toMap
    assert(s(1L) > s(2L))
    assert(s(2L) == s(3L))
  }

  test("docs with no query term are absent; matching is case-folded") {
    val out = run(Seq(
      (1L, "CAT scan"),
      (2L, "nothing relevant here")), Seq("cat"))
    assert(out.map(_._1) == List(1L))
  }

  test("multi-term scores sum and n_terms counts matched terms") {
    val out = run(Seq(
      (1L, "cat dog"),
      (2L, "cat cat"),
      (3L, "dog mouse")), Seq("cat", "dog"))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._3 == 2)
    assert(byDoc(2L)._3 == 1)
    assert(byDoc(3L)._3 == 1)
  }

  test("top-k cut orders by score desc then doc_id") {
    val docs = (1L to 30L).map(i => (i, if (i % 2 == 0) "cat cat pad" else "cat pad pad"))
    val out = run(docs, Seq("cat"), limit = 5)
    assert(out.length == 5)
    // tf=2 docs (even ids) outrank tf=1; ties break by ascending doc_id
    assert(out.map(_._1) == List(2L, 4L, 6L, 8L, 10L))
  }

  private def rrf(r: Int): Double = 1.0 / (Retrieval.RrfK + r)
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q118 fusion: per-leg ranks combine, absent legs contribute zero") {
    import spark.implicits._
    // lex ranks: doc 1 (tf 2) → 1, doc 2 (tf 1) → 2, doc 3 absent
    val docs = Seq(
      (1L, "cat cat dog"), (2L, "cat fish pad"), (3L, "dog pad pad"))
      .toDF("doc_id", "text")
    // cosines vs vec 0 = [1,0]: v0 1.0, v3 1.0 (colinear, id tie-break),
    // v1 ≈ .707, v2 ≈ −.707 → dense ranks 0→1, 3→2, 1→3, 2→4
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 1f)),
      (2L, Array(-1f, 1f)), (3L, Array(0.5f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrf(docs, emb, Seq("cat"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toList
    val expected = List(
      (1L, 1, 3, r6(rrf(1) + rrf(3))),
      (2L, 2, 4, r6(rrf(2) + rrf(4))),
      (0L, 0, 1, r6(rrf(1))),
      (3L, 0, 2, r6(rrf(2))))
    assert(out == expected)
  }

  test("q118 leg cut: a doc outside both legs' top-k is absent entirely") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat"), (2L, "cat cat pad"), (3L, "cat pad pad"),
      (4L, "pad pad pad"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)), (3L, Array(0.9f, 0.1f)),
      (1L, Array(0.5f, 0.5f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    // legK=2: lex keeps docs 1,2; dense keeps vecs 0,3 → fused {0,1,2,3};
    // doc 4 misses both cuts and must not appear
    val out = Retrieval.hybridRrf(docs, emb, Seq("cat"), legK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(2L) == ((2L, 2, 0)))   // lex-only
    assert(byDoc(0L) == ((0L, 0, 1)))   // dense-only
    assert(byDoc(3L) == ((3L, 0, 2)))   // dense-only despite lex tf 1
  }
}
