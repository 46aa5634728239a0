package graft

import org.apache.spark.sql.functions._

/** The native expression must agree exactly with the HOF composition it
  * replaces — `array_distinct(transform(sequence(1, size(w) - 1), i ->
  * concat(w[i-1], ' ', w[i])))` per side then intersect/union sizes —
  * which is also the shape the DuckDB oracle replays for q70. */
class BigramJaccardSpec extends SparkSpec {
  import spark.implicits._

  private val hofForm =
    """CASE WHEN size(a) < 2 OR size(b) < 2 THEN 0.0D ELSE (
      |  CAST(size(array_intersect(ga, gb)) AS DOUBLE) /
      |  (size(ga) + size(gb) - size(array_intersect(ga, gb)))) END""".stripMargin

  // sequence(1, 0) DESCENDS in Spark, so guard <2-word arrays (q70 itself
  // filters size >= 2 before the expression ever sees a row)
  private def withGrams(colName: String) =
    s"CASE WHEN size($colName) < 2 THEN array() ELSE " +
      s"array_distinct(transform(sequence(1, size($colName) - 1), " +
      s"i -> concat($colName[i - 1], ' ', $colName[i]))) END"

  test("matches the HOF composition on varied word arrays") {
    val rows = Seq(
      (Seq("the", "quick", "brown", "fox"), Seq("the", "quick", "red", "fox")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),                    // identical → 1.0
      (Seq("a", "b"), Seq("c", "d")),                              // disjoint → 0.0
      (Seq("x", "x", "x", "x"), Seq("x", "x")),                    // repeated bigram collapses
      (Seq("ä", "ö", "ü"), Seq("ä", "ö", "ß")),                    // multi-byte words
      (Seq("solo"), Seq("a", "b")),                                // <2 words on one side
      (Seq("w1", "w2", "w1", "w2", "w3"), Seq("w2", "w3", "w1", "w2"))
    ).toDF("a", "b")
    val both = rows
      .withColumn("ga", expr(withGrams("a")))
      .withColumn("gb", expr(withGrams("b")))
      .withColumn("native", expr("bigram_jaccard(a, b)"))
      .withColumn("hof", expr(hofForm))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(r.fieldIndex("native")) == r.getDouble(r.fieldIndex("hof")),
        r.getSeq[String](0).mkString(",") + " vs " + r.getSeq[String](1).mkString(","))
    }
  }

  test("null array propagates null") {
    val r = Seq((Option.empty[Seq[String]], Option(Seq("a", "b"))))
      .toDF("a", "b")
      .withColumn("native", expr("bigram_jaccard(a, b)")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("native")))
  }
}
