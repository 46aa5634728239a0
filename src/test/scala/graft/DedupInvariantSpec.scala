package graft

import graft.Tables.T
import graft.operators.{Similarity, TextDedup}
import org.apache.spark.sql.functions._

/** Invariant checks for the dedup/similarity operators over the shipped
  * sf0.001 tables (real near-duplicates planted by the data generator). */
class DedupInvariantSpec extends SparkSpec {

  private lazy val t = T(spark, "/root/testdata/sf0.001")

  test("exact dedup: re-crawled ids count 2, others 1; ids preserved") {
    val rows = TextDedup.q24DocDedupExact(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, cnt) = (r.getLong(0), r.getLong(2))
      assert(if (id % 5 == 0) cnt == 2 else cnt == 1, s"doc $id count $cnt")
    }
  }

  test("minhash LSH finds pairs and every pair verifies at jaccard >= 0.8") {
    val rows = TextDedup.q27MinhashNearDup(t).collect()
    assert(rows.nonEmpty, "generator plants near-dups; none found")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.8 && j <= 1.0)
    }
  }

  test("simhash pairs are within the claimed hamming bound") {
    val rows = TextDedup.q28Simhash(t).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(2) >= 0 && r.getInt(2) <= 3))
  }

  test("bigram jaccard pairs are ordered, thresholded, and block-consistent") {
    val rows = TextDedup.q70NgramJaccard(t).collect()
    assert(rows.nonEmpty, "generator plants shared-prefix docs; none found")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // canonical orientation, no mirrors
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0, s"jaccard $j out of range")
    }
    // pairs are unique — the block join must not emit a pair twice
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("ann top-k: 5 ranked neighbors per query, cosine in [-1,1], descending") {
    val rows = Similarity.q25AnnCosineTopk(t).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.forall(c => c >= -1.0 && c <= 1.0))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh-bucketed ann returns a subset of candidates sharing the bucket") {
    val rows = Similarity.q26AnnLshBucketed(t).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(2) >= 1 && r.getInt(2) <= 3))
  }

  test("xxhash64 row hashes are stable and distinct across rows") {
    // engine-side row-hash (cityHash64's role); not oracle-checkable, so
    // pinned here: deterministic across evaluations, no collisions on ids
    val h = t.part.select(xxhash64(col("p_partkey"), col("p_name")).as("h"))
    val first = h.collect().map(_.getLong(0))
    val second = h.collect().map(_.getLong(0))
    assert(first.toSeq == second.toSeq)
    assert(first.distinct.length == first.length)
  }

  test("incremental dedup: batch docs attribute to the min even-id signature match") {
    import spark.implicits._
    def sigs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("sig", org.apache.spark.sql.functions.expr("minhash12(text).mh"))
      .filter(org.apache.spark.sql.functions.col("sig").isNotNull)
    val corpus = sigs(Seq(
      (2L, "the quick brown fox jumps"),
      (6L, "the quick brown fox jumps"),   // corpus dup — min id 2 is canonical
      (4L, "an entirely different body")))
    val batch = sigs(Seq(
      (3L, "the quick brown fox jumps"),   // dup of 2
      (5L, "a unique incoming document"),  // fresh
      (7L, "xy")))                         // <3 words, no signature
    val out = TextDedup.incrementalDedup(batch, corpus).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toList
    assert(out == List((3L, true, 2L), (5L, false, -1L)))
  }

  test("leakage split: every near-dup family lands wholly in one split") {
    val rows = graft.operators.Corpus.q116LeakageSplit(spark, t)
      .groupBy("canonical_id")
      .agg(countDistinct("split").as("n_splits"), count(lit(1)).as("n_docs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == 1L,
      s"family ${r.getLong(0)} straddles splits"))
    // the generator plants near-dups, so at least one family is >1 doc —
    // the integrity claim is vacuous otherwise
    assert(rows.exists(_.getLong(2) > 1L), "no multi-doc family in corpus")
  }

  test("semdedup: planted twins drop onto their source; originals survive") {
    val rows = Similarity.q117SemDedup(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, kept) = (r.getLong(0), r.getBoolean(2))
      if (id >= 100000L) { // planted scaled twin of id - 100000
        assert(!kept, s"twin $id should drop")
        assert(r.getLong(3) == id - 100000L, s"twin $id dup_of ${r.get(3)}")
      } else assert(kept, s"original $id should survive (ε-gap is ~0.47 vs 0.99)")
    }
  }

  test("semantic decontam: flagged set == the planted twins, mapped to source") {
    val rows = Similarity.q122SemanticDecontam(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(rows.nonEmpty)
    // exactly the planted contamination surfaces (natural max ≈ 0.48),
    // each twin matched to its own eval source with cosine ≈ 1
    rows.foreach { case (trainId, evalId, cos) =>
      assert(trainId >= 200000L, s"non-planted $trainId flagged")
      assert(evalId == trainId - 200000L, s"twin $trainId matched $evalId")
      assert(cos > 0.9999, s"twin $trainId cosine $cos")
    }
    val expected = t.embeddings.select("vec_id").collect().map(_.getLong(0))
      .filter(_ % 97 == 0).map(_ + 200000L).toSet
    assert(rows.map(_._1).toSet == expected)
  }
}
