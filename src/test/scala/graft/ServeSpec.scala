package graft

import org.apache.spark.sql.functions._
import graft.Serve._

/** Serve.smallSort must be a drop-in for a trailing orderBy on bounded
  * results: identical row sequence for both the Column and String
  * overloads, including desc ordering and a post-aggregate (shuffled)
  * child — the shapes the suite's serving sorts actually use. */
class ServeSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(("b", 2, 1.5), ("a", 9, -0.5), ("c", 2, 3.0), ("a", 4, 0.0),
        ("d", 7, 2.5), ("b", 5, 1.0), ("c", 8, -2.0), ("a", 1, 4.0))
      .toDF("k", "n", "x")
  }

  test("string overload matches orderBy on a post-aggregate result") {
    val agg = df.groupBy("k").agg(sum("n").as("total"), avg("x").as("mean"))
    assert(agg.smallSort("k").collect().toSeq ===
      agg.orderBy("k").collect().toSeq)
  }

  test("column overload matches orderBy incl. desc and tie-break") {
    val agg = df.groupBy("k").agg(count(lit(1)).as("c"), sum("n").as("total"))
    assert(agg.smallSort(col("c").desc, col("k").asc).collect().toSeq ===
      agg.orderBy(col("c").desc, col("k").asc).collect().toSeq)
  }

  test("result is a single partition (no range exchange, no sampling job)") {
    val sorted = df.groupBy("k").agg(sum("n").as("total")).smallSort("k")
    assert(sorted.rdd.getNumPartitions === 1)
  }
}
