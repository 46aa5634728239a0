package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** q143's IVF search must match an independently-written model: the same
  * Lloyd quantizer as KmeansSpec's, list assignment to the FINAL
  * centroids, nprobe=1 probing, quantized-cosine top-3 inside the probed
  * list only. Also pins the structural IVF properties (candidates share
  * the query's cluster; a query never matches itself). */
class IvfLearnedSpec extends SparkSpec {
  import spark.implicits._

  private def h60(seed: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Reference model: (query_id, cluster, rank, vec_id, cosine·1e6). */
  private def model(rows: Seq[(Long, Array[Float], Int)], k: Int,
                    iters: Int): Seq[(Long, Int, Int, Long, Long)] = {
    def quant(v: Float): Long = Math.round(v.toDouble * 1000)
    val q = rows.map { case (id, v, _) => id -> v.map(quant) }.toMap
    val seeds = rows.map(_._1).sortBy(id => (h60(143, id.toString), id))
      .take(k).zipWithIndex.map { case (id, i) => (i + 1, id) }
    var cent: Map[Int, Array[Long]] =
      seeds.map { case (c, id) => c -> q(id).clone() }.toMap
    def assign(): Map[Long, Int] = q.map { case (id, v) =>
      id -> cent.toSeq.map { case (c, cv) =>
        (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    }
    def truncDiv(s: Long, n: Long): Long =
      if (s >= 0) s / n else -((-s) / n)
    for (_ <- 1 to iters) {
      val a = assign()
      val next = a.groupBy(_._2).map { case (c, members) =>
        val vs = members.keys.toSeq.map(q)
        c -> Array.tabulate(vs.head.length)(d =>
          truncDiv(vs.map(_(d)).sum, vs.size.toLong))
      }
      cent = cent.map { case (c, old) => c -> next.getOrElse(c, old) }
    }
    val lists = assign() // final E-step vs the FINAL centroids
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val aa = a.map(x => x * x).sum
      val bb = b.map(x => x * x).sum
      dot / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
    }
    lists.filter(_._1 < 10).toSeq.sortBy(_._1).flatMap { case (qid, c) =>
      lists.toSeq
        .filter { case (id, cc) => cc == c && id != qid }
        .map { case (id, _) =>
          (id, BigDecimal(cos(q(qid), q(id)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, cs) => (-cs, id) }
        .take(3).zipWithIndex
        .map { case ((id, cs), i) =>
          (qid, c, i + 1, id, math.round(cs * 1e6)) }
    }
  }

  private def run(rows: Seq[(Long, Array[Float], Int)], k: Int)
  : Seq[(Long, Int, Int, Long, Long)] = {
    val df = rows.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Similarity.ivfLearned(df, k, 3).collect().toSeq.map { r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        math.round(r.getDouble(4) * 1e6))
    }
  }

  test("random corpus: search matches the model exactly") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 60L).map { id =>
      (id, Array.fill(8)((rnd.nextFloat() - 0.5f) * 1.4f), (id % 3).toInt)
    }
    assert(run(rows, 4) == model(rows, 4, 3))
  }

  test("clustered corpus: every hit shares the query's list and near " +
    "twins are found") {
    val rnd = new scala.util.Random(37)
    // 3 tight blobs; queries 0..9 land in blobs by id % 3
    val rows = (0L until 45L).map { id =>
      val c = (id % 3).toInt
      val base = Array(0.8f, -0.7f, 0.1f)(c)
      (id, Array.fill(8)(base + rnd.nextFloat() * 0.05f), c)
    }
    val got = run(rows, 3)
    assert(got == model(rows, 3, 3))
    assert(got.nonEmpty)
    // structural: rank 1..3 per query, no self-matches
    got.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.map(_._3).sorted == (1 to hits.size).toSeq)
      assert(!hits.exists(_._4 == qid))
    }
    // blob tightness: every top hit is very close (cosine > 0.99)
    got.filter(_._3 == 1).foreach { case (_, _, _, _, c6) =>
      assert(c6 > 990000L, s"top-hit cosine $c6")
    }
  }

  test("q150 incremental add: maintenance report matches an independent " +
    "model that trains on the base only and assigns the batch to the " +
    "frozen centroids") {
    val rnd = new scala.util.Random(43)
    val rows = (0L until 80L).map { id =>
      (id, Array.fill(8)((rnd.nextFloat() - 0.5f) * 1.4f), (id % 3).toInt)
    }
    val df = rows.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val k = 4
    val got = Similarity.ivfIncremental(df, k, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)

    // independent model: Lloyd over base ids only, batch assigned to the
    // FINAL centroids without retraining
    def quant(v: Float): Long = Math.round(v.toDouble * 1000)
    val q = rows.map { case (id, v, _) => id -> v.map(quant) }.toMap
    val baseIds = rows.map(_._1).filter(_ % 10 != 0)
    val batchIds = rows.map(_._1).filter(_ % 10 == 0)
    val seeds = baseIds.sortBy(id => (h60(143, id.toString), id))
      .take(k).zipWithIndex.map { case (id, i) => (i + 1, id) }
    var cent: Map[Int, Array[Long]] =
      seeds.map { case (c, id) => c -> q(id).clone() }.toMap
    def assign(ids: Seq[Long]): Map[Long, Int] = ids.map { id =>
      id -> cent.toSeq.map { case (c, cv) =>
        (q(id).zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    }.toMap
    def truncDiv(s: Long, n: Long): Long =
      if (s >= 0) s / n else -((-s) / n)
    for (_ <- 1 to 3) {
      val a = assign(baseIds)
      val next = a.groupBy(_._2).map { case (c, members) =>
        val vs = members.keys.toSeq.map(q)
        c -> Array.tabulate(vs.head.length)(d =>
          truncDiv(vs.map(_(d)).sum, vs.size.toLong))
      }
      cent = cent.map { case (c, old) => c -> next.getOrElse(c, old) }
    }
    val index = assign(baseIds)
    val adds = assign(batchIds)
    val want = (1 to k).flatMap { c =>
      val b = index.filter(_._2 == c).keys.toSeq
      val a = adds.filter(_._2 == c).keys.toSeq
      if (b.isEmpty && a.isEmpty) None
      else Some((c, b.size.toLong, a.size.toLong, (b.size + a.size).toLong,
        b.sum, a.sum))
    }
    assert(got == want)
    // conservation: every vector lands in exactly one list
    assert(got.map(_._4).sum == 80L)
    assert(got.map(_._3).sum == batchIds.size.toLong)
    assert(got.map(_._5).sum == baseIds.sum)
    assert(got.map(_._6).sum == batchIds.sum)
  }

  test("q154 random projection: exact twins survive any projection " +
    "(recall 5/5, equal fingerprints); noisy blobs report an honest " +
    "partial recall") {
    // each query 0..9 gets five EXACT copies (cosine exactly 1.0, which
    // no projection can disturb and no other vector can beat), built on
    // distinct coordinate blocks so cross-query cosines stay low
    val rnd = new scala.util.Random(47)
    val base: Map[Long, Array[Float]] = (0L until 10L).map { q =>
      val v = Array.fill(64)(0.05f)
      (0 until 6).foreach(o => v((q * 6 + o).toInt) = 1.0f)
      q -> v
    }.toMap
    val rows = (0L until 10L).map(q => (q, base(q))) ++
      (0L until 10L).flatMap(q => (0 until 5).map(c =>
        (10L + q * 5 + c, base(q))))
    val df = rows.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Similarity.randomProjection(df, 16, 5).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (q, nm, pf, tf) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(nm == 5L, s"query $q twin recall $nm/5")
      assert(pf == tf, s"query $q fingerprints")
      // and the fingerprint is exactly the twin-id sum
      val twins = (0 until 5).map(c => 10L + q * 5 + c).sum
      assert(tf == twins, s"query $q truth is its twin set")
    }
    // noisy tight blobs: within-blob order is noise-dominated, so the
    // projection reports an honest PARTIAL recall — the audit's purpose
    val noisy = (0L until 45L).map { id =>
      val b = Array(0.8f, -0.7f, 0.1f)((id % 3).toInt)
      (id, Array.fill(64)(b + rnd.nextFloat() * 0.05f).toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val gn = Similarity.randomProjection(noisy, 16, 5).collect()
    assert(gn.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 5L))
    assert(gn.exists(r => r.getLong(1) < 5L),
      "noise-ranked blobs should NOT project losslessly")
  }

  test("q147 multi-probe recall: perfect on separated blobs, bounded " +
    "structure everywhere") {
    val rnd = new scala.util.Random(41)
    // 3 tight blobs, ≥6 members each — a query's 5 true neighbors all
    // share its blob, and a correct quantizer puts the blob in ONE
    // list, so nprobe=2 recall@5 must be 5/5
    val rows = (0L until 45L).map { id =>
      val c = (id % 3).toInt
      val base = Array(0.8f, -0.7f, 0.1f)(c)
      (id, Array.fill(8)(base + rnd.nextFloat() * 0.05f), c)
    }
    val df = rows.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Similarity.ivfMultiprobe(df, 3, 3).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (q, p1, p2) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(p1 != p2, s"query $q probes distinct lists")
      assert(r.getLong(4) == 5L, s"query $q recall ${r.getLong(4)}/5")
      assert(r.getLong(5) == r.getLong(6),
        s"query $q perfect recall implies identical hit-set fingerprints")
      assert(r.getLong(3) >= 5L, s"query $q candidate pool")
    }
  }

  test("q158 composed JL→IVF: exact twins survive BOTH levers (identical " +
    "projections land in one list — composed recall 5/5, equal to the " +
    "JL-alone column)") {
    // the q154 twin corpus: 10 queries, five EXACT copies each, built
    // on distinct coordinate blocks. Twins project identically, so the
    // IVF over projected space must put each twin family in one list
    // and the composed search must find all five — and the n_match_jl
    // column (the projection lever alone) must agree exactly
    val base: Map[Long, Array[Float]] = (0L until 10L).map { q =>
      val v = Array.fill(64)(0.05f)
      (0 until 6).foreach(o => v((q * 6 + o).toInt) = 1.0f)
      q -> v
    }.toMap
    val rows = (0L until 10L).map(q => (q, base(q))) ++
      (0L until 10L).flatMap(q => (0 until 5).map(c =>
        (10L + q * 5 + c, base(q))))
    val df = rows.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Similarity.jlIvf(df, 16, 10, 3, 2, 5).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val q = r.getLong(0)
      val twins = (0 until 5).map(c => 10L + q * 5 + c).sum
      assert(r.getLong(4) == 5L, s"query $q composed recall")
      assert(r.getLong(5) == 5L, s"query $q JL-alone recall")
      assert(r.getLong(6) == twins, s"query $q found set is its twin set")
      assert(r.getLong(7) == twins, s"query $q truth set is its twin set")
      assert(r.getLong(3) >= 5L, s"query $q candidate pool holds the twins")
    }
  }
}
