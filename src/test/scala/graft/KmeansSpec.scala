package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** q142's Lloyd rounds must match an independently-written fixed-point
  * model (hash seeding, milli-unit quantization, sign-split truncating
  * means, empty-cluster fallback — dust and all), and separate obvious
  * blobs perfectly. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def h60(seed: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Reference model over (vec_id, vec, label) rows. */
  private def model(rows: Seq[(Long, Array[Float], Int)], k: Int,
                    iters: Int): Map[Int, (Long, Long, Int, Long, Long)] = {
    def quant(v: Float): Long = Math.round(v.toDouble * 1000)
    val q = rows.map { case (id, v, _) => id -> v.map(quant) }.toMap
    val seeds = rows.map(_._1).sortBy(id => (h60(143, id.toString), id))
      .take(k).zipWithIndex.map { case (id, i) => (i + 1, id) }
    var cent: Map[Int, Array[Long]] =
      seeds.map { case (c, id) => c -> q(id).clone() }.toMap
    def assign(): Map[Long, (Int, Long)] = q.map { case (id, v) =>
      val best = cent.toSeq.map { case (c, cv) =>
        (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min
      id -> (best._2, best._1)
    }
    def truncDiv(s: Long, n: Long): Long =
      if (s >= 0) s / n else -((-s) / n)
    // the reported assignment is the E-step that PRODUCED the final
    // centroids (no extra corpus pass after the last update)
    var fin: Map[Long, (Int, Long)] = Map.empty
    for (_ <- 1 to iters) {
      fin = assign()
      val next = fin.groupBy(_._2._1).map { case (c, members) =>
        val vs = members.keys.toSeq.map(q)
        c -> Array.tabulate(vs.head.length)(d =>
          truncDiv(vs.map(_(d)).sum, vs.size.toLong))
      }
      cent = cent.map { case (c, old) => c -> next.getOrElse(c, old) }
    }
    val labels = rows.map(r => r._1 -> r._3).toMap
    fin.groupBy(_._2._1).map { case (c, members) =>
      val labelCounts = members.keys.toSeq.map(labels)
        .groupBy(identity).toSeq.map { case (l, xs) => (xs.size, -l) }
      val (topLabel, topN) = labelCounts.max match {
        case (n, negl) => (-negl, n)
      }
      val fp = cent(c).zipWithIndex.map { case (v, d) => (d + 1) * v }.sum
      c -> (members.size.toLong, members.values.map(_._2).sum,
        topLabel, topN.toLong, fp)
    }
  }

  private def run(rows: Seq[(Long, Array[Float], Int)], k: Int)
  : Map[Int, (Long, Long, Int, Long, Long)] = {
    val df = rows.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Similarity.kmeansFixedPoint(df, k, 3).collect().map { r =>
      r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5))
    }.toMap
  }

  test("random vectors with negative coordinates match the model exactly") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 40L).map { id =>
      (id, Array.fill(8)((rnd.nextFloat() - 0.5f) * 1.2f), (id % 5).toInt)
    }
    assert(run(rows, 4) == model(rows, 4, 3))
  }

  test("two far blobs separate perfectly with pure labels") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 30L).map { id =>
      val base = if (id % 2 == 0) 0.4f else -0.4f
      (id, Array.fill(8)(base + rnd.nextFloat() * 0.02f),
        if (id % 2 == 0) 1 else 2)
    }
    val got = run(rows, 2)
    assert(got == model(rows, 2, 3))
    assert(got.size == 2)
    got.values.foreach { case (n, _, _, topN, _) =>
      assert(topN == n, "each cluster is label-pure")
    }
    assert(got.values.map(_._1).toSeq.sorted == Seq(15L, 15L))
  }
}
