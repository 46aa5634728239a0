package graft

import graft.functions.{BigramJaccard, ClaimPcts, Max2, MinGramHash, MinhashSigs, ShingleJaccard, SimHash60, SparseCosine, StancePct, TokenCounts, TopGramCount, TrigramSet, TrigramSimSorted, TrigramSimilarity, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions registering the engine's native Catalyst functions.
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * — the public extension point, so user sessions (and spark-sql shells)
  * get the functions without touching Spark internals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("trigram_similarity"),
      new ExpressionInfo(classOf[TrigramSimilarity].getName, "trigram_similarity"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`trigram_similarity`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TrigramSimilarity(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("bigram_jaccard"),
      new ExpressionInfo(classOf[BigramJaccard].getName, "bigram_jaccard"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`bigram_jaccard`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        BigramJaccard(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("sparse_cosine"),
      // The usage note carries the parity precondition to ANY session user
      // (DESCRIBE FUNCTION shows it): bit-identity with the driver-path
      // cosineSparse holds because the engine's weights are integer-valued
      // (1.0 counts + 2.0 concept weights), making the FP sums exact in
      // any accumulation order. Fractional weights (e.g. tf-idf) are still
      // CORRECT cosines, but may differ from a Map-iteration-order sum in
      // the last ulps — don't pin goldens across the two paths then.
      new ExpressionInfo(classOf[SparseCosine].getName, null, "sparse_cosine",
        "sparse_cosine(a, b) - cosine similarity of two term-sorted " +
          "array<struct<term:string, w:double>> sparse vectors. " +
          "Exactly matches graft's driver-path cosineSparse only for " +
          "integer-valued weights (exact FP sums in any order); " +
          "fractional weights give a correct but order-dependent value.",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`sparse_cosine`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        SparseCosine(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("min_gram_hash"),
      new ExpressionInfo(classOf[MinGramHash].getName, "min_gram_hash"),
      (exprs: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"min_gram_hash $what must be an integer literal, got ${other.sql}")
        }
        if (exprs.length != 3)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`min_gram_hash`",
              "expectedNum" -> "3",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        MinGramHash(exprs.head,
          intLit(exprs(1), "seed"), intLit(exprs(2), "gram_len"))
      }))
    e.injectFunction((
      FunctionIdentifier("claim_pcts"),
      new ExpressionInfo(classOf[ClaimPcts].getName, "claim_pcts"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`claim_pcts`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        ClaimPcts(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("stance_pct"),
      new ExpressionInfo(classOf[StancePct].getName, "stance_pct"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`stance_pct`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        StancePct(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`token_counts`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TokenCounts(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("minhash12"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash12"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`minhash12`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        MinhashSigs(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("shingle_jaccard"),
      new ExpressionInfo(classOf[ShingleJaccard].getName, "shingle_jaccard"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`shingle_jaccard`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        ShingleJaccard(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`simhash60`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        SimHash60(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("trigram_set"),
      new ExpressionInfo(classOf[TrigramSet].getName, "trigram_set"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`trigram_set`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TrigramSet(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("trigram_sim_sorted"),
      new ExpressionInfo(classOf[TrigramSimSorted].getName, null,
        "trigram_sim_sorted",
        "trigram_sim_sorted(ga, gb) - trigram Jaccard over two SORTED " +
          "distinct gram arrays (the trigram_set output contract); " +
          "value-identical to trigram_similarity on the original strings.",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`trigram_sim_sorted`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TrigramSimSorted(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("top_gram_count"),
      new ExpressionInfo(classOf[TopGramCount].getName, null, "top_gram_count",
        "top_gram_count(words, n) - highest occurrence count of any " +
          "n-gram of adjacent elements in a string array (n = 1: the " +
          "elements themselves; n >= 2: space-joined adjacent runs). " +
          "0 when the array has fewer than n elements.",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`top_gram_count`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val n = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_gram_count gram size must be an integer literal, got ${other.sql}")
        }
        TopGramCount(exprs.head, n)
      }))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`vec_dot`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        VecDot(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("max2"),
      new ExpressionInfo(classOf[Max2].getName, null, "max2",
        "max2(expr) - the two largest values of expr in one pass, as " +
          "struct<first, second> (second is null for singleton groups; " +
          "ties land in second). Orderable types only; structs compare " +
          "lexicographically like Spark's own max.",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`max2`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        Max2(exprs.head).toAggregateExpression()
      }))
  }
}
