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
