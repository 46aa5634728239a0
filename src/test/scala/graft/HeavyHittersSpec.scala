package graft

import org.apache.spark.sql.functions._

/** The SpaceSaving sketch: exactness below capacity, the estimate
  * guarantees above it (true ≤ count ≤ true + err, mass conservation on
  * a single partition), merge behavior across partitions, and the
  * deterministic output order. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int = 1) =
    items.toDF("w").repartition(parts)
      .agg(expr(s"heavy_hitters(w, $k)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList

  test("exact below capacity: counts are true, err 0, order (count desc, item)") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    for (parts <- Seq(1, 4)) {
      val got = sketch(new scala.util.Random(41).shuffle(items), 10, parts)
      assert(got == List(("a", 5L, 0L), ("b", 3L, 0L), ("c", 3L, 0L), ("d", 1L, 0L)),
        s"parts=$parts")
    }
  }

  test("guarantees above capacity: true <= est <= true + err; k entries kept") {
    // heavy items + a long tail of singletons forcing constant evictions
    val heavy = Seq.fill(60)("hot1") ++ Seq.fill(40)("hot2")
    val tail = (1 to 100).map(i => s"t$i")
    val stream = heavy ++ tail // deterministic arrival order, 1 partition
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sketch(stream, 8)
    assert(got.size == 8)
    got.foreach { case (item, est, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"$item est $est below true $t")
      assert(est - err <= t, s"$item est-err ${est - err} above true $t")
    }
    // mass conservation on a single partition: every arrival increments
    // exactly one counter
    assert(got.map(_._2).sum == stream.size.toLong)
    // the true heavy hitters survive the tail
    assert(got.take(2).map(_._1) == List("hot1", "hot2"))
  }

  test("merged partial sketches keep the guarantee bounds") {
    val stream = Seq.fill(50)("big") ++ (1 to 200).map(i => s"n${i % 40}")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sketch(new scala.util.Random(42).shuffle(stream), 12, parts = 6)
    assert(got.size == 12)
    got.foreach { case (item, est, err) =>
      assert(est >= truth.getOrElse(item, 0L), item)
      assert(est - err <= truth.getOrElse(item, 0L), item)
    }
    assert(got.head._1 == "big")
  }

  test("grouped sketches stay per-group; empty strings counted like any item") {
    val df = Seq(("x", "a"), ("x", "a"), ("x", "b"), ("y", "b")).toDF("g", "w")
    val got = df.groupBy("g").agg(expr("heavy_hitters(w, 4)").as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("x", "a", 2L), ("x", "b", 1L), ("y", "b", 1L)))
  }

  test("nulls are skipped; fully-null group yields an empty array") {
    val got = Seq[(String, String)](("g", null), ("g", null)).toDF("g", "w")
      .groupBy("g").agg(expr("heavy_hitters(w, 4)").as("hh"))
      .select(size(col("hh"))).collect().head.getInt(0)
    assert(got == 0)
  }

  test("ObjectHashAggregate sort-based fallback path keeps exact-mode counts") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "2")
      val rnd = new scala.util.Random(65)
      val rows = (1L to 3000L).map(i => (s"g${rnd.nextInt(80)}", s"w${rnd.nextInt(10)}"))
      val df = rows.toDF("g", "w").repartition(8)
      val got = df.groupBy("g").agg(expr("heavy_hitters(w, 16)").as("hh"))
        .select(col("g"), explode(col("hh")).as("e"))
        .select(col("g"), col("e.item"), col("e.count"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // 10 distinct words < k = 16 → exact everywhere, even through the
      // serialize/merge-heavy fallback path
      val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.nonEmpty)
      got.foreach { case (g, w, cnt, err) =>
        assert(err == 0L, s"$g/$w err $err")
        assert(cnt == truth((g, w)), s"$g/$w")
      }
      assert(got.size == truth.size)
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("streaming aggregation: sketch state survives state-store round-trips") {
    import org.apache.spark.sql.types._
    // two source files → two micro-batches; the batch-2 update must merge
    // against batch-1's sketch deserialized from the state store
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-stream").toString
    val schema = StructType(Seq(StructField("g", StringType), StructField("w", StringType)))
    try {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"g":"x","w":"a"}
        |{"g":"x","w":"a"}
        |{"g":"x","w":"b"}""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"g":"x","w":"a"}
        |{"g":"y","w":"c"}""".stripMargin)
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(dir)
      .groupBy("g").agg(expr("heavy_hitters(w, 4)").as("hh"))
      .writeStream.format("memory").queryName("hhstream").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT g, hh FROM hhstream").collect()
      .flatMap { r =>
        r.getSeq[org.apache.spark.sql.Row](1).map(e =>
          (r.getString(0), e.getString(0), e.getLong(1), e.getLong(2)))
      }.toSet
    assert(got == Set(("x", "a", 3L, 0L), ("x", "b", 1L, 0L), ("y", "c", 1L, 0L)))
    } finally { // cleanup must survive assertion failures (r12 review)
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
