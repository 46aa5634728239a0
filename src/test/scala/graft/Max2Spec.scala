package graft

import org.apache.spark.sql.functions._

/** `max2` (functions/Max2.scala) must agree with the two-pass SQL form
  * it replaces in q23: first = max(x), second = max(x) over rows
  * strictly below the max — on every group shape (singletons, ties,
  * nulls, structs) and across partial/merge paths (the multi-partition
  * test forces serialize/deserialize + merge). */
class Max2Spec extends SparkSpec {
  import spark.implicits._

  test("longs: first/second match max and strict-runner-up; singleton second is null") {
    val df = Seq(
      ("a", 5L), ("a", 9L), ("a", 7L),
      ("b", 3L),
      ("c", 4L), ("c", 4L), ("c", 1L) // tie: second = 4 (multiset top-2)
    ).toDF("k", "v")
    val got: Map[String, (Long, Any)] = df.groupBy("k").agg(expr("max2(v)").as("m"))
      .select(col("k"), col("m.first").as("f"), col("m.second").as("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(got("a") == ((9L, 7L)))
    assert(got("b") == ((3L, null)))
    assert(got("c") == ((4L, 4L)))
  }

  test("nulls are skipped like max; all-null group yields null struct") {
    val df = Seq(("a", Some(2L)), ("a", None), ("a", Some(8L)), ("n", None))
      .toDF("k", "v")
    val got = df.groupBy("k").agg(expr("max2(v)").as("m")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(got("a").asInstanceOf[org.apache.spark.sql.Row].getLong(0) == 8L)
    assert(got("n") == null)
  }

  test("random multi-partition structs agree with the two-pass window form") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(5000)(
      (rnd.nextInt(40), rnd.nextInt(1000), rnd.nextInt(100000).toLong, rnd.nextDouble()))
    // 8 partitions force partial buffers through serialize/merge
    val df = spark.createDataFrame(rows.map(r => (r._1, r._2, r._3, r._4)))
      .toDF("k", "d", "id", "pct").repartition(8)
    val viaMax2 = df.groupBy("k")
      .agg(expr("max2(struct(d, id, pct))").as("m"))
      .select(col("k"), col("m.first").as("f"), col("m.second").as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("d").desc, col("id").desc, col("pct").desc)
    val viaWindow = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("k")
      .agg(max(when(col("rn") === 1, struct(col("d"), col("id"), col("pct")))).as("f"),
        max(when(col("rn") === 2, struct(col("d"), col("id"), col("pct")))).as("s"))
    val a = viaMax2.orderBy("k").collect().map(_.toString)
    val b = viaWindow.orderBy("k").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("non-orderable input fails at analysis") {
    val df = Seq((1, Map("a" -> 1))).toDF("k", "m")
    val e = intercept[Exception] {
      df.groupBy("k").agg(expr("max2(m)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("order") ||
      e.getMessage.contains("max2"))
  }
}
