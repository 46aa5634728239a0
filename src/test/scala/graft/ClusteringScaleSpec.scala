package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** The distributed clustering path (clusterQuestionsAtScale): agreement
  * with the driver-side greedy linkage on well-separated corpora, the
  * DOCUMENTED divergence (transitive merge vs first-cluster-wins), and
  * the driver path's asserted corpus bound. */
class ClusteringScaleSpec extends SparkSpec {
  import spark.implicits._

  private def partition(rows: Seq[(String, Int)]): Set[Set[String]] =
    rows.groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("scale path matches the greedy partition on a well-separated corpus") {
    val qs = Seq(
      "Atomausstieg rückgängig machen",
      "stricter climate laws",
      "return to nuclear power",
      "EU climate priority",
      "return to nuclear power")
    val df = qs.zipWithIndex.toDF("question", "idx")
    val scale = Clustering
      .clusterQuestionsAtScale(spark, df, "question", "idx")
      .select("question", "cluster_id").as[(String, Int)].collect().toSeq

    val distinctQs = qs.distinct
    val greedyIds = Clustering.clusterQuestions(distinctQs)
    assert(partition(scale) == partition(distinctQs.zip(greedyIds)))

    // cluster ids follow first-appearance order, as on the driver path
    val byQ = scale.toMap
    assert(byQ("Atomausstieg rückgängig machen") == 0)
    assert(byQ("stricter climate laws") == 1)
    assert(byQ("EU climate priority") == 2)
    assert(byQ("return to nuclear power") == 0)
  }

  test("documented divergence: a bridge question merges transitively at scale") {
    // A and B are below threshold; C is above threshold to both.
    val a = "nuclear kosten risiko sicherheit"
    val b = "nuclear zukunft arbeit wirtschaft"
    val c = "nuclear"
    assert(Clustering.questionSimilarity(a, b) < Clustering.ClusterThreshold)
    assert(Clustering.questionSimilarity(a, c) >= Clustering.ClusterThreshold)
    assert(Clustering.questionSimilarity(b, c) >= Clustering.ClusterThreshold)

    // greedy: C joins A's (first) cluster; B stays separate
    assert(Clustering.clusterQuestions(Seq(a, b, c)) == Seq(0, 1, 0))

    // scale: transitive closure merges all three through the bridge
    val df = Seq(a, b, c).zipWithIndex.toDF("question", "idx")
    val scale = Clustering
      .clusterQuestionsAtScale(spark, df, "question", "idx")
      .select("question", "cluster_id").as[(String, Int)].collect().toMap
    assert(scale.values.toSet.size == 1)
  }

  test("scale-path labels use the shortest-then-lexicographic tie rule") {
    val df = Seq("nuclear zukunft", "nuclear")
      .zipWithIndex.toDF("question", "idx")
    val out = Clustering
      .clusterQuestionsAtScale(spark, df, "question", "idx")
      .select("cluster_label").distinct().as[String].collect()
    assert(out.toSeq == Seq("nuclear"))
  }

  test("prefix-filtered edges reproduce the brute-force transitive closure " +
    "on a dense hot-vocabulary corpus") {
    // Adversarial for the prefix filter: a tiny vocabulary where every
    // term is hot, so pruning gets no help from rarity and any missed
    // candidate would split a component. Expected partition is computed
    // by brute-force all-pairs cosine + union-find on the driver.
    val vocab = Vector("nuclear", "climate", "energy", "kosten", "zukunft",
      "windkraft", "solar", "kohle", "atomkraft", "netz")
    val rnd = new scala.util.Random(42)
    val qs = Vector.fill(60) {
      val n = 2 + rnd.nextInt(4)
      Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }.distinct
    // union-find over pairs with cosine >= threshold
    val parent = Array.tabulate(qs.size)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (i <- qs.indices; j <- qs.indices if i < j)
      if (Clustering.questionSimilarity(qs(i), qs(j)) >= Clustering.ClusterThreshold) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    val expected = qs.indices.groupBy(find).values
      .map(_.map(qs).toSet).toSet
    val df = qs.zipWithIndex.toDF("question", "idx")
    val scale = Clustering
      .clusterQuestionsAtScale(spark, df, "question", "idx")
      .select("question", "cluster_id").as[(String, Int)].collect().toSeq
    assert(partition(scale) == expected)
  }

  test("iterative min-label loop agrees exactly with the driver union-find " +
    "fast path on the same corpus") {
    // smallGraphBound = -1 forces the distributed loop on a corpus the
    // fast path would otherwise take — without this, no test would
    // exercise the at-scale CC loop at all after the r8.2 fast path.
    val vocab = Vector("nuclear", "climate", "energy", "kosten", "zukunft",
      "windkraft", "solar", "kohle", "atomkraft", "netz")
    val rnd = new scala.util.Random(7)
    val qs = Vector.fill(50) {
      val n = 2 + rnd.nextInt(4)
      Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }.distinct
    val df = qs.zipWithIndex.toDF("question", "idx")
    val fast = Clustering
      .clusterQuestionsAtScale(spark, df, "question", "idx")
      .orderBy("question").collect().map(_.toString).toSeq
    val loop = Clustering
      .clusterQuestionsAtScale(spark, df, "question", "idx",
        smallGraphBound = -1L)
      .orderBy("question").collect().map(_.toString).toSeq
    assert(fast == loop)
  }

  test("row-level wrapper carries every input row") {
    val df = Seq("climate", "climate", "nuclear")
      .zipWithIndex.toDF("question", "idx")
    val out = Clustering
      .clusterAttributionsAtScale(spark, df, "question", "idx")
    assert(out.count() == 3)
  }

  test("driver path asserts its corpus bound loudly") {
    val big = spark.range(0, Clustering.MaxDriverCorpus + 1)
      .select(concat(lit("unique phrasing nr "), col("id")).as("question"),
        col("id").as("idx"))
    val e = intercept[IllegalArgumentException] {
      Clustering.clusterAttributions(spark, big, "question", "idx")
    }
    assert(e.getMessage.contains("clusterQuestionsAtScale"))
  }
}
