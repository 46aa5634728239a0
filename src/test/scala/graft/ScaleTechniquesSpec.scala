package graft

import graft.operators.ScaleTechniques
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The scale techniques must actually deliver their plan shapes, not just
  * run: bucketed joins shuffle neither side; salted joins return the same
  * rows as the plain join; partitioned writes prune. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    // drop any prior run's tables AND their warehouse dirs — the in-memory
    // catalog forgets the table but the location survives JVM restarts
    for (tbl <- Seq("b_orders", "b_customer")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    ScaleTechniques.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_custkey", 8)
    ScaleTechniques.writeBucketed(
      t.customer.select("c_custkey", "c_name"), "b_customer", "c_custkey", 8)
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
    val plainShuffles = ScaleTechniques.shuffleCount(
      t.orders.hint("merge")
        .join(t.customer.hint("merge"), col("o_custkey") === col("c_custkey")))
    assert(ScaleTechniques.shuffleCount(joined) == 0,
      "bucketed join must not shuffle")
    assert(plainShuffles > 0, "control: unbucketed SMJ does shuffle")
    assert(joined.count() ==
      t.orders.join(t.customer, col("o_custkey") === col("c_custkey")).count())
  }

  test("q101: the declared bucketed-join query's only exchange is the aggregate") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val q = ScaleTechniques.q101BucketedJoin(t)
    // join side exchange-free; groupBy(c_mktsegment) contributes the one
    assert(ScaleTechniques.shuffleCount(q) == 1)
    val plain = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("c_mktsegment")
    assert(q.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join returns exactly the plain join's rows") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val big = t.orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    val small2 = t.customer.select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = big.join(small2, Seq("o_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    val salted = ScaleTechniques
      .saltedJoin(big, small2, "o_custkey", "o_orderkey", 4)
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  // --- q138 z-order layout ---

  /** Independent Morton model: interleave the low 16 bits of xn (even
    * positions) and yn (odd positions). */
  private def morton(xn: Long, yn: Long): Long =
    (0 until 16).map { i =>
      (((xn >> i) & 1L) << (2 * i)) | (((yn >> i) & 1L) << (2 * i + 1))
    }.sum

  test("q138: the in-plan Morton interleave matches the bit model") {
    val rnd = new scala.util.Random(31)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (32768L, 1L)) ++ Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val interleave = (0 until 16).map { i =>
      s"shiftleft(shiftright(xn, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(yn, $i) & 1, ${2 * i + 1})"
    }.mkString(" + ")
    val got = pairs.toDF("xn", "yn").withColumn("z", expr(interleave))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"($x, $y)")
    }
    // locality: z restricted to a fixed top-bit prefix pins BOTH dims
    assert(morton(65535L, 65535L) == (1L << 32) - 1)
  }

  test("q138: audit invariants — per-layout totals, matched rows equal " +
    "across layouts, scanned files cover all matches") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val rows = ScaleTechniques.zorderSkipping(t.lineitem).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("linear", "zorder"))
    val n = t.lineitem.count()
    rows.foreach { r =>
      assert(r.getLong(2) == n, "every row lands in exactly one file")
      assert(r.getLong(1) <= ScaleTechniques.ZFiles, "file count bounded")
      assert(r.getLong(3) <= r.getLong(1), "scanned <= files")
      assert(r.getLong(4) <= r.getLong(2), "rows scanned <= rows")
      // min/max pruning is sound: a file holding a matching row always
      // overlaps the box, so every match lies inside scanned files
      assert(r.getLong(6) <= r.getLong(4), "matches within scanned rows")
    }
    assert(rows(0).getLong(6) == rows(1).getLong(6),
      "both layouts see the same matching rows")
  }

  // --- q141 bloom skipping index ---

  test("q141: bloom guarantees and the rarity ladder's monotone skipping") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val rows = ScaleTechniques.bloomSkipping(t.documents).collect()
    assert(rows.map(_.getInt(0)).toSeq ==
      ScaleTechniques.BloomProbeDivisors.sorted)
    rows.foreach { r =>
      // a bloom may over-scan but never under-scan: no false negatives,
      // hits = true + false positives
      assert(r.getBoolean(6), s"false negative at $r")
      assert(r.getLong(3) == r.getLong(4) + r.getLong(5), s"accounting: $r")
      assert(r.getLong(4) <= r.getLong(2), "true files within probed")
      // a term in d docs spans at most d files
      assert(r.getLong(4) <= r.getLong(7), s"files_true <= docs_matched: $r")
    }
    // rarer target -> fewer (or equal) truly-containing files
    val byDiv = rows.map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(byDiv(200) <= byDiv(20) && byDiv(50) <= byDiv(5))
  }

  test("q141: the per-file bloom cannot miss a synthetic planted term") {
    import spark.implicits._
    // 40 tiny docs; doc 7 and doc 23 carry the needle bigram
    val docs = (0L until 40L).map { i =>
      val base = s"alpha beta gamma d$i"
      (i, if (i == 7 || i == 23) s"$base needle term" else base)
    }.toDF("doc_id", "text")
    val out = ScaleTechniques.bloomSkipping(docs).collect()
    out.foreach { r =>
      assert(r.getBoolean(6))
      assert(r.getLong(5) == 0L || r.getLong(5) > 0L) // fp is data, not a bug
    }
    // every probe's true files are covered by bloom hits (already pinned
    // by no_false_negatives; re-assert the arithmetic)
    out.foreach(r => assert(r.getLong(3) >= r.getLong(4)))
  }

  test("partitioned sorted write prunes partitions at read") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val base = Files.createTempDirectory("graft-partwrite")
    try {
      val dir = base.toString + "/orders"
      ScaleTechniques.writePartitionedSorted(
        t.orders.withColumn("o_month", date_format(col("o_orderdate"), "yyyyMM")),
        dir, "o_month", Seq("o_orderkey"))
      val pruned = spark.read.parquet(dir).filter(col("o_month") === "199506")
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [isnotnull(o_month"),
        "partition filter must reach the scan")
      assert(pruned.count() ==
        t.orders.filter(date_format(col("o_orderdate"), "yyyyMM") === "199506").count())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base.toFile)
    }
  }
}
