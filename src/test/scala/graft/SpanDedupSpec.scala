package graft

import graft.Tables.T
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** q84 semantics on hand-built corpora (the oracle pins the real corpus;
  * this pins the rules): cross-doc-only marking, overlapping-span union,
  * full-removal empty rejoin, short-doc passthrough. */
class SpanDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextDedup.spanDedup(rows.toDF("doc_id", "text"))
  }

  private val eight = "w1 w2 w3 w4 w5 w6 w7 w8"

  test("a gram shared by two docs marks both; unrelated docs pass through") {
    val out = run(Seq(
      (1L, s"alpha $eight omega"),
      (2L, s"beta $eight gamma delta"),
      (3L, "totally different words here only once seen ever more")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4))).toList
    // doc 1: words = alpha + 8 + omega = 10; grams at pos 0..2; shared
    // gram "w1..w8" sits at pos 1 → covered 1..8 → kept alpha, omega
    assert(out(0) == ((1L, 10, 1L, 8, "alpha omega")))
    assert(out(1)._5 == "beta gamma delta")
    assert(out(2) == ((3L, 9, 0L, 0, "totally different words here only once seen ever more")))
  }

  test("a gram repeated only WITHIN one doc is not contamination") {
    val out = run(Seq(
      (1L, s"$eight filler $eight"),
      (2L, "unrelated text with eight distinct words again repeated never across")))
      .collect().map(r => (r.getLong(0), r.getString(4))).toMap
    assert(out(1L) == s"$eight filler $eight")
  }

  test("overlapping shared spans union their coverage; full overlap empties the doc") {
    val out = run(Seq(
      (1L, eight),
      (2L, eight),
      (3L, s"$eight w9"))) // grams [0]=w1..w8, [1]=w2..w9; only first shared
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getString(4))).toList
    assert(out(0) == ((1L, 8, "")))
    assert(out(1) == ((2L, 8, "")))
    assert(out(2) == ((3L, 8, "w9")))
  }
}
