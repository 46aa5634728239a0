package graft

import graft.operators.Merge
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Sticky-status merge tie-break cases —
  * tests/study_scraper/test_dedup.py:106-361 semantics and
  * storage/postgres.py:325-390 column policies. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, String, Seq[String], Option[String], Option[Long])]) =
    rows.toDF("id", "status", "topics", "review_note", "payload_size")

  private def merge(
      old: Seq[(Long, String, Seq[String], Option[String], Option[Long])],
      inc: Seq[(Long, String, Seq[String], Option[String], Option[Long])]): Map[Long, Row] =
    Merge.stickyMerge(df(old), df(inc))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("rejected is sticky against any incoming status") {
    val m = merge(
      old = Seq((1L, "rejected", Seq("a"), None, Some(10L))),
      inc = Seq((1L, "pending", Seq("b"), None, Some(20L))))
    assert(m(1L).getString(1) == "rejected")
  }

  test("kept is sticky; pending is promotable to incoming") {
    val m = merge(
      old = Seq((1L, "kept", Seq(), None, None), (2L, "pending", Seq(), None, None)),
      inc = Seq((1L, "pending", Seq(), None, None), (2L, "kept", Seq(), None, None)))
    assert(m(1L).getString(1) == "kept")
    assert(m(2L).getString(1) == "kept")
  }

  test("topics merge distinct and sorted; review note keeps first non-null") {
    val m = merge(
      old = Seq((1L, "pending", Seq("b", "a"), Some("old note"), Some(1L))),
      inc = Seq((1L, "pending", Seq("a", "c"), Some("new note"), Some(2L))))
    assert(m(1L).getString(2) == "a|b|c")
    assert(m(1L).getString(3) == "old note")   // first non-null wins
    assert(m(1L).getLong(4) == 2L)             // payload: newest wins
  }

  test("old-only and incoming-only rows both survive the full outer join") {
    val m = merge(
      old = Seq((1L, "kept", Seq("x"), None, Some(5L))),
      inc = Seq((2L, "pending", Seq("y"), Some("n"), Some(6L))))
    assert(m.keySet == Set(1L, 2L))
    assert(m(1L).getString(1) == "kept" && !m(1L).getBoolean(5))
    assert(m(2L).getString(1) == "pending" && !m(2L).getBoolean(5))
  }

  test("was_merged flags only rows present on both sides") {
    val m = merge(
      old = Seq((1L, "pending", Seq(), None, None), (2L, "pending", Seq(), None, None)),
      inc = Seq((1L, "pending", Seq(), None, None)))
    assert(m(1L).getBoolean(5))
    assert(!m(2L).getBoolean(5))
  }
}
