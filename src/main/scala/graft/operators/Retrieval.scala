package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.T

/** Keyword retrieval over the documents table — BM25 ranking, the lexical
  * scoring a training-data pipeline uses for targeted corpus pulls
  * ("fetch documents about X for mixture rebalancing") and as the sparse
  * side of hybrid search next to the embedding ANN family (q25/q26/q58).
  */
object Retrieval {

  /** The fixed keyword query; terms chosen from the corpus vocabulary so
    * every term has a real df and the ranking exercises the idf spread. */
  val QueryTerms: Seq[String] = Seq("spark", "stream", "window", "hash")

  val K1 = 1.2
  val B = 0.75

  /** q85 — BM25 top-20 documents for [[QueryTerms]] (Robertson/Sparck
    * Jones idf with the +1 floor, the Lucene-style formulation):
    * score(d) = Σ_t ln((N − df_t + 0.5)/(df_t + 0.5) + 1) ·
    * tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * 100 TB shape: per-document term frequencies are computed MAP-SIDE
    * (an array filter per query term — the query is a handful of terms,
    * so this is a few passes over each doc's token array, never a full
    * term explode); only docs with ≥1 hit emit rows, ≤|query| skinny
    * rows each. Corpus stats (N, avgdl) and per-term df are broadcast
    * 1-row/|query|-row aggregates; the scoring join is therefore
    * map-side, the per-doc score aggregate is the one shuffle (≤|query|
    * rows per doc), and the top-20 is a TakeOrdered, never a full sort.
    * Scores round to 4 decimals BEFORE the ordering so the cut is
    * FP-stable across engines. */
  def q85Bm25(t: T): DataFrame = bm25(t.documents, QueryTerms)

  /** The reusable BM25 core over (doc_id, text) rows — public so specs
    * drive hand-built corpora through the identical pipeline. */
  def bm25(documents: DataFrame, queryTerms: Seq[String],
           limit: Int = 20): DataFrame = {
    val docs = documents.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("w"))
      .withColumn("dl", size(col("w")).cast("double"))
    // query terms enter as Column literals, never spliced into an expr
    // string — a term containing a quote is data, not expression syntax
    val termLits = array(queryTerms.map(lit): _*)
    val tfs = docs.select(col("doc_id"), col("dl"),
        explode(filter(
          transform(termLits, q => struct(
            q.as("term"),
            size(filter(col("w"), x => x === q)).cast("double").as("tf"))),
          s => s.getField("tf") > 0)).as("s"))
      .select(col("doc_id"), col("dl"), col("s.term").as("term"), col("s.tf").as("tf"))
      // feeds the df aggregate AND the scoring join; without truncation
      // each consumer re-runs the tokenize + per-term count scan (the
      // q84 2-consumer treatment — lazy, MEMORY_AND_DISK, spills)
      .localCheckpoint(false)
    val stats = docs.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val dfreq = tfs.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tfs.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("tscore")), 4).as("score"),
        count(lit(1)).cast("int").as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  /** RRF smoothing constant (the de-facto standard k=60 from Cormack,
    * Clarke & Buettcher 2009). */
  val RrfK = 60

  /** q118 — HYBRID retrieval: BM25 (lexical leg, [[QueryTerms]]) fused
    * with embedding cosine (dense leg, the vec_id-0 vector as the query
    * embedding) by reciprocal-rank fusion:
    * rrf(d) = Σ_legs 1/(k + rank_leg(d)), absent legs contributing 0.
    * This is the retrieval stage of a RAG/data-curation pipeline — pull
    * candidates by keyword AND by meaning, fuse on ranks so neither
    * leg's score scale dominates.
    *
    * 100 TB shape: each leg keeps its own scale plan (BM25 map-side tf +
    * broadcast df/stats with a TakeOrdered top-k; the dense leg is the
    * broadcast-query ANN shape of q25/q58 — swap in the IVF probe for a
    * big corpus) and emits only its top-k ROWS, so the fusion join is
    * k-vs-k tiny regardless of corpus size; rank arithmetic is integer,
    * the rrf sum is two IEEE divisions of exact integers, rounded before
    * the final cut so the top-20 is engine-stable. */
  def q118HybridRrf(t: T): DataFrame =
    hybridRrf(t.documents, t.embeddings, QueryTerms)

  /** The reusable hybrid core — the dense-leg query is the vec_id-0
    * embedding; public so specs drive hand-built corpora through the
    * identical fusion. */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String], legK: Int = 50,
                limit: Int = 20): DataFrame = {
    // lexical leg: BM25 top-legK, rank over the deterministic (score,
    // doc_id) order — the window runs on the already-cut legK-row frame
    val lex = bm25(documents, queryTerms, legK)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .as("lex_rank"))
    // dense leg: cosine vs the query embedding; orderBy+limit is a
    // TakeOrdered (never a full sort), rank assigned on the cut frame
    val emb = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
    val qvec = emb.filter(col("vec_id") === 0).select(col("vec").as("qvec"))
    val dense = emb.crossJoin(broadcast(qvec))
      .withColumn("cosine", expr("vec_dot(vec, qvec)") /
        (sqrt(expr("vec_dot(vec, vec)")) * sqrt(expr("vec_dot(qvec, qvec)"))))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(legK)
      .select(col("vec_id").as("doc_id"), row_number()
        .over(Window.orderBy(col("cosine").desc, col("vec_id")))
        .as("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .na.fill(0, Seq("lex_rank", "dense_rank"))
      .withColumn("rrf", round(
        when(col("lex_rank") > 0,
          lit(1.0) / (lit(RrfK) + col("lex_rank"))).otherwise(lit(0.0)) +
        when(col("dense_rank") > 0,
          lit(1.0) / (lit(RrfK) + col("dense_rank"))).otherwise(lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(limit)
      .select("doc_id", "lex_rank", "dense_rank", "rrf")
  }
}
