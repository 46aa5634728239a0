package graft

import org.apache.spark.sql.functions._

/** The bounded-heap topk aggregate vs the window form it replaces:
  * random-corpus equality across partition counts, multiset semantics,
  * k larger than the group, null skipping, and struct tie-breaks. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("matches row_number <= k over random groups at 1 and 8 partitions") {
    val rnd = new scala.util.Random(126)
    val rows = (1L to 2000L).map(i => (s"g${rnd.nextInt(7)}", rnd.nextInt(500), i))
    val df = rows.toDF("g", "v", "id")
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("g", "v", "id").collect().map(r =>
          (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    }
    for (parts <- Seq(1, 8)) {
      val got = df.repartition(parts)
        .groupBy("g").agg(expr("topk(struct(v, id), 5)").as("tk"))
        .select(col("g"), explode(col("tk")).as("e"))
        .select(col("g"), col("e.v"), col("e.id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("multiset: duplicate values occupy multiple slots") {
    val got = Seq(5, 5, 5, 1).toDF("v")
      .agg(expr("topk(v, 3)").as("tk")).select(explode(col("tk")))
      .collect().map(_.getInt(0)).toList
    assert(got == List(5, 5, 5))
  }

  test("k larger than the group returns everything, DESC-sorted") {
    val got = Seq(2, 9, 4).toDF("v")
      .agg(expr("topk(v, 10)").as("tk")).select(explode(col("tk")))
      .collect().map(_.getInt(0)).toList
    assert(got == List(9, 4, 2))
  }

  test("ObjectHashAggregate sort-based fallback path keeps exactness") {
    // force the fallback after 2 in-memory groups: the buffers then
    // travel through serialize/deserialize + merge on the sort-based
    // path — the state-store-grade exercise for the heap buffer
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "2")
      val rnd = new scala.util.Random(64)
      val rows = (1L to 3000L).map(i => (s"g${rnd.nextInt(100)}", rnd.nextInt(1000), i))
      val df = rows.toDF("g", "v", "id").repartition(8)
      val got = df.groupBy("g").agg(expr("topk(struct(v, id), 3)").as("tk"))
        .select(col("g"), explode(col("tk")).as("e"))
        .select(col("g"), col("e.v"), col("e.id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val expected = rows.groupBy(_._1).flatMap { case (g, vs) =>
        vs.map(t => (t._2, t._3)).sorted(Ordering.Tuple2[Int, Long].reverse)
          .take(3).map { case (v, id) => (g, v, id) }
      }.toSet
      assert(got == expected)
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("nulls skipped; all-null group yields empty array") {
    val got = Seq[Option[Int]](None, Some(3), None).toDF("v")
      .agg(expr("topk(v, 2)").as("tk")).select(col("tk"))
      .collect().head.getSeq[Int](0).toList
    assert(got == List(3))
    val empty = Seq[Option[Int]](None, None).toDF("v")
      .agg(size(expr("topk(v, 2)"))).collect().head.getInt(0)
    assert(empty == 0)
  }
}
