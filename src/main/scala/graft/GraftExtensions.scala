package graft

import graft.functions.TrigramSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  }
}
