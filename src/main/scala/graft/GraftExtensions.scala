package graft

import graft.functions.{BigramJaccard, MinGramHash, SparseCosine, TrigramSimilarity}
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
      new ExpressionInfo(classOf[SparseCosine].getName, "sparse_cosine"),
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
  }
}
