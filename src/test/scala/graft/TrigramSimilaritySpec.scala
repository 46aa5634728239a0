package graft

import graft.functions.TrigramSimilarity
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native expression must agree exactly with the composed
  * higher-order-function form it replaces (and with pg_trgm semantics:
  * distinct character trigrams, Jaccard). */
class TrigramSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("direct compute: identity, disjoint, known overlap") {
    assert(TrigramSimilarity.compute(u("small ring"), u("small ring")) == 1.0)
    assert(TrigramSimilarity.compute(u("abcdef"), u("uvwxyz")) == 0.0)
    // "abcd" → {abc, bcd}; "abce" → {abc, bce}: 1 / 3
    assert(TrigramSimilarity.compute(u("abcd"), u("abce")) == 1.0 / 3)
    // sub-trigram inputs → empty sets → 0
    assert(TrigramSimilarity.compute(u("ab"), u("ab")) == 0.0)
  }

  test("SQL function (codegen path) matches the HOF form on real names") {
    val hof =
      """size(array_intersect(
        |  array_distinct(transform(sequence(1, length(a) - 2), i -> substring(a, i, 3))),
        |  array_distinct(transform(sequence(1, length(b) - 2), i -> substring(b, i, 3))))) * 1.0D /
        |size(array_union(
        |  array_distinct(transform(sequence(1, length(a) - 2), i -> substring(a, i, 3))),
        |  array_distinct(transform(sequence(1, length(b) - 2), i -> substring(b, i, 3)))))""".stripMargin
    val names = Tables.T(spark, "/root/testdata/sf0.001").part
      .select(lower(col("p_name")).as("a"))
      .limit(50).collect().map(_.getString(0))
    val pairs = (for (x <- names; y <- names.take(10)) yield (x, y)).toSeq
      .filter { case (x, y) => x.length >= 3 && y.length >= 3 }
    val df = pairs.toDF("a", "b")
      .withColumn("native", expr("trigram_similarity(a, b)"))
      .withColumn("composed", expr(hof))
    assert(df.filter(col("native") =!= col("composed")).count() == 0)
  }
}
