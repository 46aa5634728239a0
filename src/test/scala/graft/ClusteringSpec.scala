package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's clustering regression cases —
  * tests/study_scraper/test_clustering.py:15-114 and the tuning notes in
  * clustering.py:30-122 (over/under-merge pairs observed on real data). */
class ClusteringSpec extends AnyFunSuite {
  import Clustering._

  test("fold: umlauts and eszett normalize") {
    assert(fold("rückgängig") == "ruckgangig")
    assert(fold("Straße") == "strasse")
    assert(fold("ÜBER") == "uber")
  }

  test("tokens: split on non-alphanumerics after folding") {
    assert(tokens("Atomausstieg rückgängig machen!") ==
      Seq("atomausstieg", "ruckgangig", "machen"))
  }

  test("question vector: stopwords dropped, concepts weighted, singulars") {
    val v = questionVector("stricter climate laws")
    // 'climate' → concept (2.0); 'laws' → 'law' singular → concept (2.0)
    assert(v("climate") == 2.0)
    assert(v("law") == 2.0)
    assert(v.contains("stricter"))
    // German compound decomposes via substring: climate AND law
    val g = questionVector("Klimaschutzgesetz verschärfen")
    assert(g.contains("climate") && g.contains("law"))
  }

  test("DE/EN reversal pair clusters (ROADMAP example)") {
    val sim = questionSimilarity(
      "Atomausstieg rückgängig machen", "return to nuclear power")
    assert(sim >= ClusterThreshold, s"expected >= 0.72, got $sim")
  }

  test("same-topic different questions must NOT merge (over-merge regression)") {
    val sim = questionSimilarity(
      "stricter climate laws", "EU climate priority")
    assert(sim < ClusterThreshold, s"expected < 0.72, got $sim")
  }

  test("polarity guard: keep vs phase out nuclear power must NOT merge") {
    val sim = questionSimilarity(
      "Keep nuclear power", "Phase out nuclear power")
    assert(sim < ClusterThreshold, s"expected < 0.72, got $sim")
  }

  test("climate policy phrasings separate at 2.0 concept weight") {
    val sim = questionSimilarity(
      "ambitious climate policy", "climate protection is an important task")
    assert(sim < ClusterThreshold, s"expected < 0.72, got $sim")
  }

  test("greedy single-linkage: first-appearance ids, deterministic") {
    val qs = Seq(
      "Atomausstieg rückgängig machen", // 0
      "stricter climate laws",          // 1
      "return to nuclear power",        // joins 0
      "EU climate priority",            // 2 (not with 1)
      "return to nuclear power")        // joins 0
    val ids = clusterQuestions(qs)
    assert(ids == Seq(0, 1, 0, 2, 0))
  }

  test("the q46 oracle identity: greedy first-cluster-wins equals the " +
    "creation rank of the min decreasing-path-reachable creator, on " +
    "random dependency graphs") {
    // The r15 oracle rewrite rests on this lemma: cluster(i) =
    // min over matched earlier j of cluster(j) unfolds to "rank of the
    // minimum-index question reachable from i via a strictly-decreasing
    // similarity path" (the minimum reachable index is always a
    // creator, and creators are numbered in index order). Exercise both
    // computations on 100 random DAG-shaped match structures.
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(80)
      val p = 0.02 + rnd.nextDouble() * 0.25
      val preds: Map[Int, Seq[Int]] =
        (1 to n).map(i =>
          i -> (1 until i).filter(_ => rnd.nextDouble() < p)).toMap
      // (a) the sequential greedy, exactly as the reference runs it
      val cluster = new Array[Int](n + 1)
      var fresh = 0
      for (i <- 1 to n) {
        val ps = preds(i)
        if (ps.isEmpty) { cluster(i) = fresh; fresh += 1 }
        else cluster(i) = ps.map(cluster).min
      }
      // (b) the fixpoint the oracle's doubling converges to: min index
      // reachable via decreasing paths, then dense creation-order rank
      val m = Array.tabulate(n + 1)(identity)
      for (i <- 1 to n) if (preds(i).nonEmpty) m(i) = preds(i).map(m).min
      val rank = (1 to n).filter(i => preds(i).isEmpty)
        .zipWithIndex.toMap
      (1 to n).foreach { i =>
        assert(cluster(i) == rank(m(i)),
          s"seed $seed node $i: greedy ${cluster(i)} vs fixpoint ${rank(m(i))}")
      }
    }
  }

  test("interned two-pointer greedy is bit-identical to the naive " +
    "Map-walk greedy on a random mixed corpus") {
    // The optimized loop reorders dot-product summation (sorted term ids
    // vs Map hash order); integer-valued weights make both sums exact, so
    // assignments must agree EXACTLY. 400 questions drawn from a small
    // mixed DE/EN vocabulary force dense posting lists, shared concepts,
    // singular folding, and cluster-0 early exits.
    val vocab = Vector(
      "atomausstieg", "klimaschutzgesetz", "tempolimit", "rente", "steuern",
      "mieten", "asyl", "migration", "laws", "climate", "nuclear", "power",
      "speed", "pension", "tax", "housing", "autobahn", "strict", "policy",
      "priority", "verbot", "kohleausstieg", "energie", "renewable",
      "machen", "rückgängig", "der", "die", "should", "be", "more")
    val rnd = new scala.util.Random(20260813L)
    val qs = Vector.fill(400) {
      Seq.fill(2 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // Naive reference: the r7 shape — inverted index over raw term
    // strings, Map.getOrElse dots in cosineSparse's iteration order.
    def naive(questions: Seq[String]): Seq[Int] = {
      val vectors = questions.map(questionVector)
      val assignments = new Array[Int](vectors.length)
      var nClusters = 0
      for (i <- vectors.indices) {
        val matching = (0 until i).filter(j =>
          cosineSparse(vectors(i), vectors(j)) >= ClusterThreshold)
        assignments(i) =
          if (matching.isEmpty) { nClusters += 1; nClusters - 1 }
          else matching.map(assignments).min
      }
      assignments.toSeq
    }
    assert(clusterQuestions(qs) == naive(qs))
  }

  test("cluster label: most frequent phrasing, shortest on ties") {
    val qs = Seq("aa bb", "aa bb", "aa bb cc")
    // identical phrasing twice → its cluster labels by frequency
    val ids = Seq(0, 0, 1)
    val labels = clusterLabels(qs, ids)
    assert(labels(0) == "aa bb")
    // tie case: two distinct phrasings once each → shortest wins
    val l2 = clusterLabels(Seq("longer phrasing", "short"), Seq(0, 0))
    assert(l2(0) == "short")
  }

  test("semantic filter: pipe alternatives, best-of scoring, threshold") {
    val rows = Seq(
      "reintroduce compulsory military service",
      "completely unrelated gardening question",
      "conscription for all citizens")
    val hits = semanticFilter("conscription|military service", rows)
    val hitQs = hits.map(_._1)
    assert(hitQs.contains("conscription for all citizens"))
    assert(hitQs.contains("reintroduce compulsory military service"))
    assert(!hitQs.contains("completely unrelated gardening question"))
    // ranked best-first
    assert(hits.map(-_._2) == hits.map(-_._2).sorted)
  }

  test("empty/no-alternative query yields nothing") {
    assert(semanticFilter(" | ", Seq("anything")).isEmpty)
    assert(questionSimilarity("", "nuclear") == 0.0)
  }
}
