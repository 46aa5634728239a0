package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The deterministic HLL and Count–Min sketch aggregates: register state
  * recomputed independently from the portable md5 hash, exact order- and
  * partition-independence (the property a float-summing aggregate cannot
  * have), mergeability across partition layouts, the CMS one-sided
  * guarantee, and the ObjectHashAggregate sort-based fallback path. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val words = (1 to 400).map(i => s"tok$i")
  // a skewed multiset: tok1 appears 400 times, tok400 once
  private val stream: Seq[String] =
    words.zipWithIndex.flatMap { case (w, i) => Seq.fill(400 - i)(w) }

  // Independent h60: first 15 hex chars of md5("<seed>:<s>") as a 60-bit
  // int — recomputed from MessageDigest here, NOT via the production
  // helper, so a hash regression cannot cancel out of the comparison.
  private def h60(seed: Int, s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$s".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  // --- independent register model (same arithmetic as the scaladoc) ---
  private def hllRegisters(distinct: Seq[String]): Array[Int] = {
    val regs = new Array[Int](512)
    distinct.foreach { w =>
      val h = h60(129, w)
      val bucket = (h % 512).toInt
      val rho = java.lang.Long.numberOfLeadingZeros(h / 512) - 12
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs
  }

  private def hllSummary(regs: Array[Int]): (Int, Long, Long, Long) = {
    var nZero = 0; var sumRho = 0L; var regFp = 0L; var z = 0L
    regs.zipWithIndex.foreach { case (r, j) =>
      if (r == 0) nZero += 1
      sumRho += r; regFp += (j + 1).toLong * r; z += 1L << (52 - r)
    }
    (nZero, sumRho, regFp, z)
  }

  test("hll_distinct register summary matches the independent model and " +
    "is identical at 1, 7, and 32 partitions") {
    val (nZero, sumRho, regFp, z) = hllSummary(hllRegisters(words))
    for (parts <- Seq(1, 7, 32)) {
      val row = stream.toDF("w").repartition(parts)
        .agg(expr("hll_distinct(w)").as("h")).select("h.*").head()
      assert(row == Row(nZero, sumRho, regFp, z), s"parts=$parts")
    }
  }

  test("hll_distinct ignores duplicates: multiset and distinct inputs " +
    "produce the same state") {
    val a = stream.toDF("w").agg(expr("hll_distinct(w)")).head()
    val b = words.toDF("w").agg(expr("hll_distinct(w)")).head()
    assert(a == b)
  }

  test("hll estimate lands within the 512-register error envelope") {
    val row = stream.toDF("w")
      .agg(expr("hll_distinct(w)").as("h")).select("h.z_scaled").head()
    val est = 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0 *
      4503599627370496.0 / row.getLong(0).toDouble
    // 400 distinct, sigma ~ 4.6%; 15% is the q129 contract bound — but
    // n = 400 < 2.5m means q129 would take the linear-counting branch
    // here; the raw estimator alone is still required to be in the
    // right ballpark (biased high at low fill, hence the loose bound)
    assert(est > 200 && est < 800, s"raw est $est for 400 distinct")
  }

  private def cmsMatrix(items: Seq[String]): Array[Long] = {
    val m = new Array[Long](1024)
    items.foreach { w =>
      (0 until 4).foreach { r =>
        m(r * 256 + (h60(130, s"$r:$w") % 256).toInt) += 1L
      }
    }
    m
  }

  test("cms_sketch matrix equals the independent model at 1 and 32 " +
    "partitions, and estimates upper-bound every true count") {
    val expected = cmsMatrix(stream)
    for (parts <- Seq(1, 32)) {
      val got = stream.toDF("w").repartition(parts)
        .agg(expr("cms_sketch(w)").as("m")).head().getSeq[Long](0)
      assert(got == expected.toSeq, s"parts=$parts")
    }
    // one-sided guarantee on every word, exercised via the same
    // element_at-min probe q130 uses, against the 1-row matrix
    val mat = stream.toDF("w").agg(expr("cms_sketch(w)").as("m"))
    val joined = words.toDF("w").crossJoin(broadcast(mat))
      .select(col("w"), least((0 until 4).map(r => expr(
        s"element_at(m, CAST($r * 256 + " +
          s"${operators.TextDedup.h60(130, s"concat('$r:', w)")} % 256 + 1 AS INT))")): _*)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    words.foreach { w =>
      assert(joined(w) >= truth(w), s"$w: est ${joined(w)} < true ${truth(w)}")
    }
  }

  test("sketch merge across a shuffle equals the single-pass sketch per group") {
    // grouped: each group's sketch must equal a sketch of just its rows
    val df = stream.zipWithIndex
      .map { case (w, i) => (s"g${i % 3}", w) }.toDF("g", "w")
    val grouped = df.repartition(16)
      .groupBy("g").agg(expr("hll_distinct(w)").as("h"), expr("cms_sketch(w)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getStruct(1), r.getSeq[Long](2))).toMap
    (0 until 3).foreach { g =>
      val rows = stream.zipWithIndex.collect { case (w, i) if i % 3 == g => w }
      val single = rows.toDF("w").coalesce(1)
        .agg(expr("hll_distinct(w)").as("h"), expr("cms_sketch(w)").as("m")).head()
      assert(grouped(s"g$g")._1 == single.getStruct(0), s"hll g$g")
      assert(grouped(s"g$g")._2 == single.getSeq[Long](1), s"cms g$g")
    }
  }

  test("ObjectHashAggregate sort-based fallback keeps all five sketch states exact") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "2")
      val df = stream.zipWithIndex
        .map { case (w, i) => (s"g${i % 7}", w, (i * 2654435761L) & ((1L << 60) - 1)) }
        .toDF("g", "w", "h")
      val aggs = Seq(expr("hll_distinct(w)").as("hl"), expr("cms_sketch(w)").as("m"),
        expr("bloom_bits(h)").as("bf"), expr("kmv_sketch(h, 32)").as("kmv"),
        expr("hist_sketch(h)").as("hs"))
      val got = df.repartition(8).groupBy("g").agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getString(0) ->
          (r.getStruct(1), r.getSeq[Long](2), r.getSeq[Long](3),
            r.getSeq[Long](4), r.getSeq[Long](5))).toMap
      (0 until 7).foreach { g =>
        val rows = stream.zipWithIndex.collect { case (w, i) if i % 7 == g =>
          (w, (i * 2654435761L) & ((1L << 60) - 1)) }
        val single = rows.toDF("w", "h").coalesce(1)
          .agg(aggs.head, aggs.tail: _*).head()
        assert(got(s"g$g")._1 == single.getStruct(0), s"hll g$g")
        assert(got(s"g$g")._2 == single.getSeq[Long](1), s"cms g$g")
        assert(got(s"g$g")._3 == single.getSeq[Long](2), s"bloom g$g")
        assert(got(s"g$g")._4 == single.getSeq[Long](3), s"kmv g$g")
        assert(got(s"g$g")._5 == single.getSeq[Long](4), s"hist g$g")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null inputs are skipped by both sketches") {
    val withNulls = (stream.map(Option(_)) ++ Seq(None, None)).toDF("w")
    val a = withNulls.agg(expr("hll_distinct(w)"), expr("cms_sketch(w)")).head()
    val b = stream.toDF("w").agg(expr("hll_distinct(w)"), expr("cms_sketch(w)")).head()
    assert(a == b)
  }

  // --- hll_regs / hll_merge_regs (the q135 rollup pair) ---

  test("hll_regs emits the raw register model; hll_merge_regs over any " +
    "grouping reproduces the direct sketch exactly") {
    val expected = hllRegisters(words).toSeq
    val direct = stream.toDF("w").repartition(8)
      .agg(expr("hll_regs(w)")).head().getSeq[Int](0)
    assert(direct == expected)
    // split the stream into 5 arbitrary fine grains, sketch each, then
    // re-aggregate the ARRAYS alone — must equal the direct registers
    val fine = stream.zipWithIndex.map { case (w, i) => (s"d${i % 5}", w) }
      .toDF("g", "w").repartition(8)
      .groupBy("g").agg(expr("hll_regs(w)").as("regs"))
    val merged = fine.agg(expr("hll_merge_regs(regs)")).head().getSeq[Int](0)
    assert(merged == expected)
    // idempotence: re-merging an overlapping grain changes nothing
    val overlapped = fine.unionByName(fine.limit(2))
      .agg(expr("hll_merge_regs(regs)")).head().getSeq[Int](0)
    assert(overlapped == expected)
  }

  test("hll_distinct summary is derivable from hll_regs output") {
    val row = stream.toDF("w")
      .agg(expr("hll_distinct(w)").as("h"), expr("hll_regs(w)").as("r"))
      .selectExpr("h.n_zero", "h.sum_rho", "h.z_scaled",
        "size(filter(r, x -> x = 0)) AS nz",
        "aggregate(r, CAST(0 AS BIGINT), (a, x) -> a + x) AS sr",
        "aggregate(r, CAST(0 AS BIGINT), " +
          "(a, x) -> a + shiftleft(CAST(1 AS BIGINT), 52 - x)) AS z")
      .head()
    assert(row.getInt(0) == row.getInt(3))
    assert(row.getLong(1) == row.getLong(4))
    assert(row.getLong(2) == row.getLong(5))
  }

  test("q136 profile composition: exact columns and top-token ranks on " +
    "a hand corpus") {
    val docs = Seq(
      ("sa", "en", "b b b a a c", 11L),
      ("sa", "de", "a a b", 5L),
      ("sb", "en", "z y", 3L)
    ).toDF("source", "lang", "text", "n_chars")
      .withColumn("doc_id", monotonically_increasing_id())
    val got = operators.TextAnalysis.corpusProfile(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val sa = got("sa")
    assert(sa.getLong(1) == 2L && sa.getLong(2) == 2L)   // n_docs, n_langs
    assert(sa.getLong(3) == 9L && sa.getLong(4) == 16L)  // n_tokens, chars
    // counts: a=4, b=4 -> tie broken item ASC: top=a, second=b
    assert(sa.getString(5) == "a" && sa.getLong(6) == 4L)
    assert(sa.getString(7) == "b")
    // bigrams: doc1 {bb, ba, aa, ac} + doc2 {aa, ab} -> 5 distinct
    assert(sa.getLong(9) == 5L)
    assert(sa.getBoolean(10))
    val sb = got("sb")
    assert(sb.getLong(1) == 1L && sb.getString(5) == "y") // ties: y < z
  }

  // --- hist_sketch (the q137 quantile histogram) ---

  // independent bucket model, recomputed here from the scaladoc formula
  private def histModel(vs: Seq[Long]): Seq[Long] = {
    val h = new Array[Long](960)
    vs.foreach { v0 =>
      val v = math.max(0L, v0)
      val b =
        if (v < 32L) v.toInt
        else {
          val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
          ((e - 4) * 16 + (v >>> (e - 4))).toInt
        }
      h(b) += 1L
    }
    h.toSeq
  }

  test("hist_sketch bucket geometry: monotone, in-range, and every value " +
    "sits in [lowerBound(b), lowerBound(b+1)) across the full Long domain") {
    import graft.functions.HistSketch.{bucketOf, lowerBound}
    val rnd = new scala.util.Random(7)
    val edges = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 1023L, 1024L,
      Long.MaxValue - 1, Long.MaxValue)
    val vs = (edges ++ Seq.fill(5000)(math.abs(rnd.nextLong()))).sorted
    vs.foreach { v =>
      val b = bucketOf(v)
      assert(b >= 0 && b < 960, s"v=$v b=$b")
      assert(lowerBound(b) <= v, s"v=$v lb=${lowerBound(b)}")
      if (b < 959) assert(v < lowerBound(b + 1), s"v=$v next=${lowerBound(b + 1)}")
      // the <= 1/16 relative-width contract the q137 ok flags rest on
      if (b < 959) assert((lowerBound(b + 1) - lowerBound(b)) * 16 <= math.max(lowerBound(b), 16L))
    }
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(bucketOf(a) <= bucketOf(b), s"monotonicity $a -> $b")
    }
    assert(bucketOf(-5L) == 0, "negatives clamp to bucket 0")
  }

  test("hist_sketch counts equal the independent model at 1 and 32 " +
    "partitions; nulls skipped") {
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(3000)(math.abs(rnd.nextLong()) % 10000000L) ++
      Seq(0L, 1L, 31L, 32L, Long.MaxValue)
    val expected = histModel(vs)
    for (parts <- Seq(1, 32)) {
      val got = vs.toDF("v").repartition(parts)
        .agg(expr("hist_sketch(v)")).head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
    val withNulls = (vs.map(Option(_)) ++ Seq(None, None)).toDF("v")
    assert(withNulls.agg(expr("hist_sketch(v)")).head().getSeq[Long](0) == expected)
  }

  test("q137 composition: estimates bracket the exact percentiles within " +
    "1/16 and the pointwise merge matches the direct global sketch") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 4000).map { i =>
      val flag = Seq("A", "N", "R")(i % 3)
      // log-uniform cents so every octave region is exercised
      (flag, math.round(math.exp(rnd.nextDouble() * 14.0)) / 100.0)
    }
    val df = rows.toDF("l_returnflag", "l_extendedprice")
    val got = operators.ScaleTechniques.histQuantiles(df).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "ALL", "N", "R"))
    got.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(7) && r.getBoolean(10),
        s"ok flags: $r")
      assert(r.getBoolean(12), s"merge_matches_direct: $r")
      // ok flags are claims; re-assert the arithmetic behind them
      for ((e, x) <- Seq((2, 3), (5, 6), (8, 9))) {
        assert(r.getLong(e) <= r.getLong(x) && r.getLong(x) * 16 <= r.getLong(e) * 17,
          s"est ${r.getLong(e)} vs exact ${r.getLong(x)}")
      }
    }
  }

  test("q137 composition: negative cents stay in bucket 0's sliver " +
    "(the clamp admits them, so the exact rank pick sees every row the " +
    "sketch counted)") {
    // 60 negatives and 40 positives, one flag: p50 target = (n+1)/2 = 50
    // -> 50th smallest = -11 cents. An >= 0 floor on bucket 0's range
    // prune dropped the negatives and shifted the pick (ADVICE r13).
    val prices = (1 to 60).map(i => -i / 100.0) ++
      (1 to 40).map(i => math.exp(i / 4.0) / 100.0)
    val df = prices.map(("A", _)).toDF("l_returnflag", "l_extendedprice")
    val cents = prices.map(p => math.round(p * 100)).sorted
    def target(n: Long, tag: String): Long = tag match {
      case "p50" => (n + 1) / 2
      case "p90" => (n * 9 + 9) / 10
      case "p99" => (n * 99 + 99) / 100
    }
    val got = operators.ScaleTechniques.histQuantiles(df).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "ALL"))
    got.foreach { r =>
      assert(r.getBoolean(12), s"merge_matches_direct: $r")
      for ((tag, x) <- Seq(("p50", 3), ("p90", 6), ("p99", 9))) {
        val want = cents((target(cents.length, tag) - 1).toInt)
        assert(r.getLong(x) == want, s"$tag exact ${r.getLong(x)} != $want")
      }
      // p50 falls in bucket 0 whose lowerBound (the estimate) clamps to
      // 0 above the negative exact value — the ok flag reports that
      assert(r.getLong(3) == -11L && !r.getBoolean(4),
        s"bucket-0 clamp honesty: $r")
    }
  }

  // --- kmv_sketch ---

  private val kmvHashes: Seq[Long] =
    (1L to 5000L).map(i => i * 1125899906842597L % (1L << 60))

  test("kmv_sketch keeps exactly the k smallest distinct values, " +
    "ascending, at 1 and 32 partitions") {
    val expected = kmvHashes.distinct.sorted.take(64)
    // duplicates in the stream must not occupy extra slots
    val dup = kmvHashes ++ kmvHashes.take(500)
    for (parts <- Seq(1, 32)) {
      val got = dup.toDF("h").repartition(parts)
        .agg(expr("kmv_sketch(h, 64)")).head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("kmv_sketch is exact (the distinct set itself) below k") {
    val small = Seq(9L, 3L, 3L, 7L, 1L)
    val got = small.toDF("h").agg(expr("kmv_sketch(h, 64)")).head().getSeq[Long](0)
    assert(got == Seq(1L, 3L, 7L, 9L))
  }

  test("kmv union estimator lands near the true distinct union") {
    import org.apache.spark.sql.functions.col
    val a = kmvHashes.take(3000).map(("a", _))
    val b = kmvHashes.drop(2000).map(("b", _)) // overlap of 1000
    val sk = (a ++ b).toDF("g", "h").repartition(8)
      .groupBy("g").agg(expr("kmv_sketch(h, 256)").as("kmv"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val u = (sk("a") ++ sk("b")).distinct.sorted.take(256)
    val theta = u.last
    val estUnion = 255.0 * 1152921504606846976.0 / theta.toDouble
    val trueUnion = (kmvHashes.take(3000) ++ kmvHashes.drop(2000)).distinct.size
    assert(math.abs(estUnion / trueUnion - 1.0) < 0.25,
      s"est $estUnion vs true $trueUnion")
    val interInU = u.toSet.intersect(sk("a").toSet.intersect(sk("b").toSet)).size
    val estInter = interInU / 256.0 * estUnion
    val trueInter = 1000.0
    assert(math.abs(estInter / trueInter - 1.0) < 0.45,
      s"est $estInter vs true $trueInter")
  }
}
