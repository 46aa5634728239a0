package graft

import graft.operators.Similarity

/** q157's IVF-PQ must match an independently-written model: the same
  * coarse Lloyd quantizer as IvfLearnedSpec's, per-subspace codebooks
  * trained with the identical recipe (hash seeds 15700+s, sign-split
  * truncating means, smallest-code tie-break), asymmetric-distance
  * ranking inside the nprobe=1 list, and the exact squared-L2 brute
  * truth. Every quantity is an exact integer, so the comparison is
  * equality, not tolerance. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def h60(seed: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def truncDiv(s: Long, n: Long): Long =
    if (s >= 0) s / n else -((-s) / n)

  /** Lloyd on a subset of dims: returns final centroids (cluster 1..k). */
  private def lloydRef(q: Map[Long, Array[Long]], k: Int, iters: Int,
                       seedTag: Int): Map[Int, Array[Long]] = {
    val seeds = q.keys.toSeq.sortBy(id => (h60(seedTag, id.toString), id))
      .take(k).zipWithIndex.map { case (id, i) => (i + 1, id) }
    var cent: Map[Int, Array[Long]] =
      seeds.map { case (c, id) => c -> q(id).clone() }.toMap
    def assign(): Map[Long, Int] = q.map { case (id, v) =>
      id -> cent.toSeq.map { case (c, cv) =>
        (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    }
    for (_ <- 1 to iters) {
      val a = assign()
      val next = a.groupBy(_._2).map { case (c, members) =>
        val vs = members.keys.toSeq.map(q)
        c -> Array.tabulate(vs.head.length)(d =>
          truncDiv(vs.map(_(d)).sum, vs.size.toLong))
      }
      cent = cent.map { case (c, old) => c -> next.getOrElse(c, old) }
    }
    cent
  }

  private def argminCluster(v: Array[Long],
                            cent: Map[Int, Array[Long]]): Int =
    cent.toSeq.map { case (c, cv) =>
      (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
    }.min._2

  /** Full IVF-PQ reference: (query_id, probe, n_candidates, n_match,
    * adc_fp, truth_fp) per query id < 10. With residual=true the
    * codebooks train on (and codes/ADC read) x − coarse centroid —
    * FAISS's by_residual default, q160's semantics. */
  private def model(rows: Seq[(Long, Array[Float], Int)], kCoarse: Int,
                    coarseIters: Int, m: Int, ksub: Int, subIters: Int,
                    topk: Int, residual: Boolean = false)
  : Seq[(Long, Int, Long, Long, Long, Long)] = {
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => Math.round(x.toDouble * 1000)) }.toMap
    val d = q.values.head.length
    val sub = d / m
    val coarse = lloydRef(q, kCoarse, coarseIters, 143)
    val lists = q.map { case (id, v) => id -> argminCluster(v, coarse) }
    // the frame the codebooks see: raw vectors, or residuals to the
    // FINAL coarse centroid of the assigned list
    val enc: Map[Long, Array[Long]] =
      if (!residual) q
      else q.map { case (id, v) =>
        id -> v.zip(coarse(lists(id))).map { case (a, b) => a - b } }
    def slice(v: Array[Long], s: Int) = v.slice(s * sub, s * sub + sub)
    val codebooks = (0 until m).map { s =>
      lloydRef(enc.map { case (id, v) => id -> slice(v, s) },
        ksub, subIters, (if (residual) 16000 else 15700) + s)
    }
    val codes = enc.map { case (id, v) =>
      id -> (0 until m).map(s => argminCluster(slice(v, s), codebooks(s)))
    }
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    q.keys.toSeq.filter(_ < 10).sorted.map { qid =>
      val probe = lists(qid)
      val cand = q.keys.toSeq.filter(id => id != qid && lists(id) == probe)
      // ADC: distance from the query's encoded subvector (raw, or its
      // own residual — nprobe=1 probes the query's own list) to the
      // candidate's code
      val adcTop = cand.map { id =>
        val adc = (0 until m).map(s =>
          l2(slice(enc(qid), s), codebooks(s)(codes(id)(s)))).sum
        (adc, id)
      }.sorted.take(topk).map(_._2)
      val truthTop = q.keys.toSeq.filter(_ != qid)
        .map(id => (l2(q(qid), q(id)), id)).sorted.take(topk).map(_._2)
      (qid, probe, cand.size.toLong,
        adcTop.count(truthTop.contains).toLong,
        adcTop.sum, truthTop.sum)
    }
  }

  test("ivfPq matches the independent reference model end to end") {
    val rnd = new scala.util.Random(157)
    val rows = (0L until 30L).map(id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfPq(df, 3, 2, 4, 4, 2, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val want = model(rows, 3, 2, 4, 4, 2, 3)
    assert(got == want)
  }

  test("ivfPqResidual matches the independent residual reference model") {
    val rnd = new scala.util.Random(160)
    val rows = (0L until 30L).map(id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfPqResidual(df, 3, 2, 4, 4, 2, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val want = model(rows, 3, 2, 4, 4, 2, 3, residual = true)
    assert(got == want)
  }

  test("q161 three-lever stack matches the independent reference model " +
    "(JL projection -> IVF lists -> PQ codes, dual audit)") {
    // 64-d corpus (jlProjected's sign matrix is 64-wide by contract)
    val rnd = new scala.util.Random(161)
    val rows = (0L until 40L).map(id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt))
    val (pDims, k, iters, nprobe, m, ksub, subIters, topk) =
      (16, 4, 2, 2, 4, 4, 2, 3)
    val sub = pDims / m
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => Math.round(x.toDouble * 1000)) }.toMap
    // the q154 sign matrix, re-derived independently
    def md5h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val signs = Array.tabulate(pDims)(j => Array.tabulate(64)(i =>
      if (md5h60(s"154:$i:$j") % 2 == 0) 1L else -1L))
    val proj = q.map { case (id, v) =>
      id -> Array.tabulate(pDims)(j =>
        v.zip(signs(j)).map { case (a, s) => a * s }.sum) }
    val coarse = lloydRef(proj, k, iters, 158)
    val lists = proj.map { case (id, v) => id -> argminCluster(v, coarse) }
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def slice(v: Array[Long], s: Int) = v.slice(s * sub, s * sub + sub)
    val codebooks = (0 until m).map { s =>
      lloydRef(proj.map { case (id, v) => id -> slice(v, s) },
        ksub, subIters, 16100 + s)
    }
    val codes = proj.map { case (id, v) =>
      id -> (0 until m).map(s => argminCluster(slice(v, s), codebooks(s)))
    }
    val want = q.keys.toSeq.filter(_ < 10).sorted.map { qid =>
      val byDist = coarse.toSeq.map { case (c, cv) =>
        (l2(proj(qid), cv), c) }.sorted.take(nprobe).map(_._2)
      val (p1, p2) = (byDist.head, byDist(1))
      val cand = q.keys.toSeq.filter(id =>
        id != qid && (lists(id) == p1 || lists(id) == p2))
      val adcTop = cand.map { id =>
        ((0 until m).map(s =>
          l2(slice(proj(qid), s), codebooks(s)(codes(id)(s)))).sum, id)
      }.sorted.take(topk).map(_._2)
      val exTop = cand.map(id => (l2(proj(qid), proj(id)), id))
        .sorted.take(topk).map(_._2)
      val truthTop = q.keys.toSeq.filter(_ != qid)
        .map(id => (l2(q(qid), q(id)), id)).sorted.take(topk).map(_._2)
      (qid, p1, p2, cand.size.toLong,
        adcTop.count(truthTop.contains).toLong,
        exTop.count(truthTop.contains).toLong,
        adcTop.sum, truthTop.sum)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.jlIvfPq(df, pDims, k, iters, nprobe, m, ksub,
      subIters, topk)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == want)
  }

  test("q162 multi-probe residual IVF-PQ matches the independent model " +
    "(per-(query, list) ADC tables)") {
    val rnd = new scala.util.Random(162)
    val rows = (0L until 30L).map(id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt))
    val (kCoarse, coarseIters, m, ksub, subIters, nprobe, topk) =
      (3, 2, 4, 4, 2, 2, 3)
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => Math.round(x.toDouble * 1000)) }.toMap
    val d = 8; val sub = d / m
    val coarse = lloydRef(q, kCoarse, coarseIters, 143)
    val lists = q.map { case (id, v) => id -> argminCluster(v, coarse) }
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def res(id: Long, list: Int): Array[Long] =
      q(id).zip(coarse(list)).map { case (a, b) => a - b }
    def slice(v: Array[Long], s: Int) = v.slice(s * sub, s * sub + sub)
    // codebooks over residuals to the OWN list (training input)
    val enc = q.map { case (id, _) => id -> res(id, lists(id)) }
    val codebooks = (0 until m).map { s =>
      lloydRef(enc.map { case (id, v) => id -> slice(v, s) },
        ksub, subIters, 16000 + s)
    }
    val codes = enc.map { case (id, v) =>
      id -> (0 until m).map(s => argminCluster(slice(v, s), codebooks(s)))
    }
    val want = q.keys.toSeq.filter(_ < 10).sorted.map { qid =>
      val byDist = coarse.toSeq.map { case (c, cv) =>
        (l2(q(qid), cv), c) }.sorted.take(nprobe).map(_._2)
      val (p1, p2) = (byDist.head, byDist(1))
      val cand = q.keys.toSeq.filter(id =>
        id != qid && (lists(id) == p1 || lists(id) == p2))
      // ADC against the table of the CANDIDATE's list: residual of the
      // query to that list's centroid vs the candidate's codes
      val adcTop = cand.map { id =>
        val rq = res(qid, lists(id))
        ((0 until m).map(s =>
          l2(slice(rq, s), codebooks(s)(codes(id)(s)))).sum, id)
      }.sorted.take(topk).map(_._2)
      val truthTop = q.keys.toSeq.filter(_ != qid)
        .map(id => (l2(q(qid), q(id)), id)).sorted.take(topk).map(_._2)
      (qid, p1, p2, cand.size.toLong,
        adcTop.count(truthTop.contains).toLong, adcTop.sum, truthTop.sum)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfPqResidualMultiprobe(df, kCoarse, coarseIters,
      m, ksub, subIters, nprobe, topk)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
  }

  test("ivfPq is deterministic across runs") {
    val rnd = new scala.util.Random(158)
    val rows = (0L until 24L).map(id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f), (id % 2).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val a = Similarity.ivfPq(df, 3, 2, 4, 4, 2, 3).collect().toSeq
    val b = Similarity.ivfPq(df, 3, 2, 4, 4, 2, 3).collect().toSeq
    assert(a == b)
  }
}
