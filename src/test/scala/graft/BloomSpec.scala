package graft

import org.apache.spark.sql.functions._

/** The bloom_bits aggregate and the q131 membership probe: bit positions
  * recomputed independently, no false negatives by construction,
  * partition independence, merge-as-OR, and the shift-and-mask probe
  * expression agreeing with direct membership. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val members: Seq[Long] = (1L to 300L).map(i => i * 982451653L % (1L << 60))
  private val strangers: Seq[Long] = (1L to 2000L).map(i => i * 899809343L % (1L << 60) + 7L)

  // independent bit model (the scaladoc arithmetic)
  private def positions(h: Long): Seq[Long] = {
    val x = h & ((1L << 60) - 1)
    Seq(x & 16383L, (x >>> 14) & 16383L, (x >>> 28) & 16383L)
  }

  private def model(hs: Seq[Long]): Array[Long] = {
    val words = new Array[Long](256)
    hs.flatMap(positions).foreach { b =>
      words(b.toInt >>> 6) |= 1L << (b.toInt & 63)
    }
    words
  }

  private val probeSql: String =
    (0 until 3).map { i =>
      val bp = s"((gram DIV ${1L << (14 * i)}) % 16384)"
      s"((shiftrightunsigned(element_at(bf, CAST($bp DIV 64 AS INT) + 1), " +
        s"CAST($bp % 64 AS INT)) & 1) = 1)"
    }.mkString("(", " AND ", ")")

  test("bit words equal the independent model at 1 and 32 partitions") {
    val expected = model(members).toSeq
    for (parts <- Seq(1, 32)) {
      val got = members.toDF("gram").repartition(parts)
        .agg(expr("bloom_bits(gram)")).head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("no false negatives: every member passes the probe; strangers " +
    "see only the expected false-positive sliver") {
    val bf = members.toDF("gram").agg(expr("bloom_bits(gram)").as("bf"))
    def probe(hs: Seq[Long]): Map[Long, Boolean] =
      hs.toDF("gram").crossJoin(broadcast(bf))
        .withColumn("c", expr(probeSql)).select("gram", "c")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val onMembers = probe(members)
    assert(onMembers.values.forall(identity), "a member failed the probe")
    // 300 members * 3 bits in 16384 -> fill ~5.3%, fp ~ fill^3 ~ 1.5e-4;
    // with 2000 strangers expect ~0 false positives. The bound would
    // catch the correlated-probe degeneration (an affine family sharing
    // one folded hash gives fp ~ n/m ~ 1.8% -> ~38 hits here — the
    // first draft's measured failure).
    val fp = probe(strangers.filterNot(members.toSet)).count(_._2)
    assert(fp <= 5, s"implausible false-positive count $fp")
  }

  test("merge is pointwise OR: union sketch equals sketch of union") {
    val a = members.take(150)
    val b = members.drop(150) ++ strangers.take(50)
    val merged = (a ++ b).toDF("gram").repartition(7)
      .agg(expr("bloom_bits(gram)")).head().getSeq[Long](0)
    assert(merged == model(a ++ b).toSeq)
  }

  test("nulls are skipped and negatives are folded, not rejected") {
    val withNull = (members.map(Option(_)) :+ None).toDF("gram")
      .agg(expr("bloom_bits(gram)")).head().getSeq[Long](0)
    assert(withNull == model(members).toSeq)
    val neg = Seq(-5L).toDF("gram").agg(expr("bloom_bits(gram)")).head().getSeq[Long](0)
    assert(neg == model(Seq(-5L)).toSeq)
  }
}
