package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank must match an independently-written fixed-point model on
  * small graphs (truncating-division dust and all), hold its mass/
  * symmetry invariants, and the declared q139 output must cover every
  * supplier. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference model: same integer arithmetic, plain Scala maps. */
  private def model(directed: Seq[(String, String)],
                    iterations: Int): Map[String, Long] = {
    val edges = directed ++ directed.map { case (a, b) => (b, a) }
    val outdeg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = outdeg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = ((Graph.DampDen - Graph.DampNum) * Graph.Scale /
      Graph.DampDen) / n
    var r = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iterations) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map(v =>
        v -> (base + Graph.DampNum * inflow.getOrElse(v, 0L) /
          Graph.DampDen)).toMap
    }
    r
  }

  private def run(directed: Seq[(String, String)],
                  iterations: Int): Map[String, Long] =
    Graph.pagerank(directed.toDF("src", "dst"), iterations)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap

  test("two-node path sits at its fixed point and matches the model") {
    val g = Seq(("a", "b"))
    val got = run(g, 5)
    assert(got == model(g, 5))
    // symmetric pair: identical ranks, fixed point of the update
    assert(got("a") == got("b"))
  }

  test("star graph: center dominates, leaves equal, truncation dust " +
    "matches the model exactly") {
    val g = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"))
    for (iters <- Seq(1, 5)) {
      val got = run(g, iters)
      val exp = model(g, iters)
      assert(got == exp, s"iters=$iters")
      assert(got("c") > got("l1"))
      assert(got("l1") == got("l2") && got("l2") == got("l3"))
      // total mass never exceeds the scale; truncation only loses
      assert(got.values.sum <= Graph.Scale)
      assert(got.values.forall(_ > 0L))
    }
  }

  test("ring is rank-uniform at every iteration count") {
    // directed 4-ring (no reverse pairs — the symmetrize contract)
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val got = run(g, 3)
    assert(got.values.toSet.size == 1, s"uniform ranks: $got")
    assert(got == model(g, 3))
  }

  /** Personalized model: teleport base and initial mass only on seeds. */
  private def pModel(directed: Seq[(String, String)], seeds: Set[String],
                     iterations: Int): Map[String, Long] = {
    val edges = directed ++ directed.map { case (a, b) => (b, a) }
    val outdeg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = outdeg.keys.toSeq.sorted
    val ns = nodes.count(seeds).toLong
    val base = ((Graph.DampDen - Graph.DampNum) * Graph.Scale /
      Graph.DampDen) / ns
    var r = nodes.map(v => v -> (if (seeds(v)) Graph.Scale / ns else 0L)).toMap
    for (_ <- 1 to iterations) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map(v =>
        v -> ((if (seeds(v)) base else 0L) +
          Graph.DampNum * inflow.getOrElse(v, 0L) / Graph.DampDen)).toMap
    }
    r
  }

  test("personalized: seed-only teleport matches the model; nodes cut " +
    "off from the seeds hold zero rank") {
    // two components: a seeded star and an unseeded pair
    val g = Seq(("c", "l1"), ("c", "l2"), ("x", "y"))
    val seeds = Set("c")
    val got = Graph.pagerank(g.toDF("src", "dst"), 5, col("node") === "c")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pModel(g, seeds, 5))
    // the walk never reaches the (x, y) component — exact zeros
    assert(got("x") == 0L && got("y") == 0L)
    // and all retained mass lives on the seeded component
    assert(got("c") > got("l1") && got("l1") == got("l2"))
    assert(got.values.sum <= Graph.Scale)
  }

  test("personalized with every node seeded equals uniform pagerank") {
    val g = Seq(("a", "b"), ("b", "c"))
    val uniform = run(g, 4)
    val allSeeded = Graph.pagerank(g.toDF("src", "dst"), 4, lit(true))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(allSeeded == uniform)
  }

  /** Weighted model: ppm outflow shares, contribution (r·w_ppm)/10⁶ —
    * same truncating Long arithmetic as the operator. */
  private def wModel(directed: Seq[(String, String, Long)],
                     iterations: Int): Map[String, Long] = {
    val sym = directed ++ directed.map { case (a, b, w) => (b, a, w) }
    val edges = sym.groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).sum) }.toSeq
    val wtot = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val ppm = edges.map { case (a, b, w) => (a, b, w * 1000000L / wtot(a)) }
    val nodes = wtot.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = ((Graph.DampDen - Graph.DampNum) * Graph.Scale /
      Graph.DampDen) / n
    var r = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iterations) {
      val inflow = ppm.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, p) => r(u) * p / 1000000L }.sum
      }
      r = nodes.map(v =>
        v -> (base + Graph.DampNum * inflow.getOrElse(v, 0L) /
          Graph.DampDen)).toMap
    }
    r
  }

  private def wRun(directed: Seq[(String, String, Long)],
                   iterations: Int): Map[String, Long] =
    Graph.weightedPagerank(directed.toDF("src", "dst", "w"), iterations)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap

  test("weighted: uneven star pulls rank toward the heavy leaf and " +
    "matches the model's truncation dust exactly") {
    // center c: leaf l1 carries 3× the mass of l2/l3
    val g = Seq(("c", "l1", 300L), ("c", "l2", 100L), ("c", "l3", 100L))
    for (iters <- Seq(1, 5)) {
      val got = wRun(g, iters)
      val exp = wModel(g, iters)
      assert(got == exp, s"iters=$iters: $got vs $exp")
      assert(got("l1") > got("l2") && got("l2") == got("l3"))
      assert(got.values.sum <= Graph.Scale)
    }
  }

  test("weighted with equal weights equals uniform pagerank") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val uniform = run(g, 4)
    val equalW = wRun(g.map { case (a, b) => (a, b, 7L) }, 4)
    assert(equalW == uniform)
  }

  test("weighted: per-pair rows sum before the split (multi-line-item " +
    "edges aggregate, not duplicate)") {
    // (c, l1) passed as two rows 100+200 must equal one row 300
    val split = Seq(("c", "l1", 100L), ("c", "l1", 200L), ("c", "l2", 100L))
    val merged = Seq(("c", "l1", 300L), ("c", "l2", 100L))
    assert(wRun(split, 3) == wRun(merged, 3))
  }

  test("q149 declared output covers every supplier with positive rank " +
    "and diverges from unweighted q139") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val out = Graph.q149WeightedPagerank(t).collect()
    assert(out.length == t.supplier.count())
    assert(out.forall(_.getLong(1) > 0L))
    val uniform = Graph.q139Pagerank(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diff = out.count(r => uniform(r.getLong(0)) != r.getLong(1))
    assert(diff > 0, "weights must actually change ranks")
  }

  /** Warm-start model: r0 = stored rank (or the new graph's teleport
    * base for newcomers), then `iterations` standard rounds. */
  private def wsModel(directed: Seq[(String, String)],
                      stored: Map[String, Long],
                      iterations: Int): Map[String, Long] = {
    val edges = directed ++ directed.map { case (a, b) => (b, a) }
    val outdeg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = outdeg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = ((Graph.DampDen - Graph.DampNum) * Graph.Scale /
      Graph.DampDen) / n
    var r = nodes.map(v => v -> stored.getOrElse(v, base)).toMap
    for (_ <- 1 to iterations) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map(v =>
        v -> (base + Graph.DampNum * inflow.getOrElse(v, 0L) /
          Graph.DampDen)).toMap
    }
    r
  }

  test("warm start: stored ranks carry into round one, newcomers start " +
    "at the teleport base, and the result matches the model") {
    val baseG = Seq(("a", "b"), ("b", "c"))
    val fullG = baseG ++ Seq(("c", "d"), ("d", "e")) // two new nodes
    val stored = run(baseG, 5)
    val storedDf = stored.toSeq.toDF("node", "rank_ppb")
    val got = Graph.warmPagerank(fullG.toDF("src", "dst"), 2, storedDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == wsModel(fullG, stored, 2))
    // a warm start from the FULL graph's own converged ranks is a
    // fixed point: two more rounds change nothing
    val full5 = run(fullG, 5)
    val again = Graph.warmPagerank(fullG.toDF("src", "dst"), 1,
      full5.toSeq.toDF("node", "rank_ppb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == wsModel(fullG, full5, 1))
  }

  test("q156 declared output: warm rank next to stored base rank; new " +
    "suppliers carry base 0") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val out = Graph.q156WarmstartPagerank(t).collect()
    assert(out.length == t.supplier.count())
    assert(out.forall(_.getLong(1) > 0L))
    assert(out.forall(_.getLong(2) >= 0L))
  }

  test("connected components: min-id labels, exact sizes, isolated " +
    "pairs and chains") {
    // two components: a 4-chain (10-11-12-13) and a pair (20-21);
    // min-id labels (node ids are Long — the ccMinLabels contract)
    val g = Seq((11L, 10L), (11L, 12L), (12L, 13L), (20L, 21L))
    val got = Graph.connectedComponents(g.toDF("src", "dst"), 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      10L -> (10L, 4L), 11L -> (10L, 4L), 12L -> (10L, 4L), 13L -> (10L, 4L),
      20L -> (20L, 2L), 21L -> (20L, 2L)))
  }

  test("q151 declared output: every entity labeled once, component " +
    "sizes consistent, threshold respected") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val out = Graph.q151ConnectedComponents(t).collect()
    assert(out.nonEmpty)
    // (side, entity) unique
    val keys = out.map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(keys.distinct.size == keys.size)
    // comp_size equals the actual member count per label
    val byLabel = out.groupBy(_.getLong(2))
    byLabel.foreach { case (lbl, rows) =>
      assert(rows.forall(_.getLong(3) == rows.length.toLong),
        s"component $lbl size")
    }
    // labels are min member node ids (packed): recompute from members
    byLabel.foreach { case (lbl, rows) =>
      val packed = rows.map(r =>
        r.getLong(1) * 2 + (if (r.getString(0) == "supplier") 1 else 0))
      assert(packed.min == lbl, s"label $lbl is the min member id")
    }
  }

  test("q159 incremental CC: merge-only update reaches the full-rebuild " +
    "fixpoint on a hand-built store (merges, untouched comps, new nodes)") {
    import org.apache.spark.sql.DataFrame
    // stored weights: base graph has comps {2,4} (pair 2-4 over
    // threshold), {6,8}, and a sub-threshold pair (10,12) at w=9;
    // threshold for this test is Graph.CcWeightThreshold, so scale
    // weights around it
    val T = Graph.CcWeightThreshold
    val storedW = Seq(
      (2L, 5L, T + 10), (4L, 5L, T + 10),     // comp {2,4,5}
      (6L, 7L, T + 10), (8L, 7L, T + 10),     // comp {6,7,8}
      (10L, 11L, T - 5)                       // sub-threshold pair
    ).toDF("src", "dst", "w")
    val baseEdges = storedW.filter(col("w") >= T).select("src", "dst")
    val storedLabels = Graph.connectedComponents(baseEdges, 30)
      .select("node", "label")
    // the batch: (a) pushes (10,11) over the threshold, (b) bridges the
    // two stored comps via a NEW node 99, (c) adds noise below threshold
    val deltaW = Seq(
      (10L, 11L, 10L),                        // crosses now: 9+10 >= T
      (2L, 99L, T + 1), (6L, 99L, T + 1),     // new node 99 merges comps
      (4L, 77L, 3L)                           // stays sub-threshold
    ).toDF("src", "dst", "w")
    val got = Graph.ccApply(storedW, storedLabels, deltaW)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // full rebuild over the union graph for the label truth
    val fullEdges = storedW.select("src", "dst", "w")
      .unionByName(deltaW)
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .filter(col("w") >= T).select("src", "dst")
    val want = Graph.connectedComponents(fullEdges, 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._3)).toMap == want,
      "incremental labels+sizes must equal the full rebuild")
    // base_label: untouched nodes keep it equal to label; merged comp
    // members show the drift; node 99 is new (-1)
    assert(got(99L)._2 == -1L)
    assert(got(2L)._2 == 2L && got(6L)._2 == 6L)
    assert(got(6L)._1 == 2L, "bridge merged {6,7,8} into label 2")
    assert(got(10L)._2 == -1L && got(11L)._2 == -1L,
      "nodes whose first edge crossed today are new to the store")
    assert(got(10L)._1 == 10L && got(11L)._1 == 10L)
  }

  test("q139 declared output covers every supplier with positive rank") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val out = Graph.q139Pagerank(t).collect()
    val nSupp = t.supplier.count()
    assert(out.length == nSupp)
    assert(out.forall(_.getLong(1) > 0L))
    // suppliers ordered, unique
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.distinct.size == ids.size)
  }
}
