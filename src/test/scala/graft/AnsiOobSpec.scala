package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the Spark 4 ANSI semantics the operators must design around:
  * EVERY out-of-bounds array access form (getItem, bracket indexing,
  * element_at) throws, while DuckDB's list indexing yields NULL — so
  * any operator reading a data-dependent position from an array whose
  * length the data controls must use try_element_at or a size guard,
  * or it diverges from (crashes where) the oracle (returns NULL).
  * The r14-advice BPE crash and the q136 short-top-k fix are both this
  * class. */
class AnsiOobSpec extends SparkSpec {
  import spark.implicits._

  test("ANSI: getItem / bracket / element_at all THROW on out-of-bounds") {
    val df = Seq(Tuple1(Seq("only"))).toDF("a")
    def crashes(f: => Any): Boolean =
      try { f; false } catch { case _: Throwable => true }
    assert(crashes(df.select(col("a").getItem(1)).collect()))
    assert(crashes(df.select(expr("a[1]")).collect()))
    assert(crashes(df.select(element_at(col("a"), 2)).collect()))
    // the safe form: NULL, like the oracle's list indexing
    assert(df.select(expr("try_element_at(a, 2)")).collect().head.isNullAt(0))
  }

  test("q136 corpus profile survives a source with ONE distinct token " +
    "(second_token NULL, not a crash)") {
    val docs = Seq(
      (1L, "solo solo solo", "xx", "tiny", 14L),
      (2L, "alpha beta beta gamma", "xx", "big", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.corpusProfile(docs)
      .orderBy("source").collect()
    val tiny = rows.find(_.getString(0) == "tiny").get
    assert(tiny.getString(tiny.fieldIndex("top_token")) == "solo")
    assert(tiny.isNullAt(tiny.fieldIndex("second_token")))
    val big = rows.find(_.getString(0) == "big").get
    assert(big.getString(big.fieldIndex("top_token")) == "beta")
    assert(!big.isNullAt(big.fieldIndex("second_token")))
  }
}
