package graft

import graft.Tables.T
import graft.operators.Polls

/** The SQL entry point (SURVEY §7.0's optional string-SQL layer) must
  * deliver EXACTLY what the DataFrame core computes: the reference's
  * latest_poll_standings mart translated to ANSI SQL and run through
  * `spark.sql` over the registered temp views is compared frame-level
  * against Polls.q23PollStandings — same columns, same values, row for
  * row. Plus P11: the identifier guard at the only place caller strings
  * meet SQL text. */
class SqlEntrySpec extends SparkSpec {

  private lazy val t = T(spark, "/root/testdata/sf0.001")

  test("spark.sql twin of q23 matches the DataFrame core frame-level") {
    val viaSql = SqlEntry.q23ViaSql(t)
    val viaDf = Polls.q23PollStandings(t)
    assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
      s"column drift: ${viaSql.columns.toSeq} vs ${viaDf.columns.toSeq}")
    val a = viaSql.collect().map(_.toSeq).sortBy(_.toString)
    val b = viaDf.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (ra, rb) => assert(ra == rb, s"$ra != $rb") }
  }

  test("registered views are queryable through the guarded accessor") {
    SqlEntry.registerViews(t)
    assert(SqlEntry.queryView(spark, "stg_poll_results", 5).count() == 5)
    assert(SqlEntry.queryView(spark, "nation", 3).count() == 3)
  }

  test("P11: identifier guard rejects injection-shaped names") {
    SqlEntry.requireIdentifier("stg_poll_results")
    SqlEntry.requireIdentifier("_t1")
    for (bad <- Seq("polls; DROP TABLE x", "a-b", "1abc", "", "a.b",
        "x'y", "p q", "a\nb", "ü", "a" * 129))
      assertThrows[IllegalArgumentException](SqlEntry.requireIdentifier(bad))
  }
}
