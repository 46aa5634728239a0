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

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
                               b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"column drift: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val ra = a.collect().map(_.toSeq).sortBy(_.toString)
    val rb = b.collect().map(_.toSeq).sortBy(_.toString)
    assert(ra.length == rb.length && ra.length > 0,
      s"${ra.length} vs ${rb.length} rows")
    ra.zip(rb).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("spark.sql daily_poll_averages matches a Window-API twin " +
    "frame-level (W1/W2/W3 through the SQL surface)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val viaSql = SqlEntry.dailyAveragesViaSql(t)
    val daily = Polls.stgPollResultsTable(t)
      .groupBy("party", "poll_date")
      .agg(count(lit(1)).as("poll_count"),
        round(avg("pct"), 4).as("avg_pct"),
        round(sum(col("pct") * col("surveyed")) / sum("surveyed"), 4)
          .as("weighted_avg"),
        sum("surveyed").cast("long").as("total_surveyed"),
        countDistinct("institute_id").as("unique_institutes"))
    val w = Window.partitionBy("party").orderBy("poll_date")
    val viaDf = daily
      .withColumn("previous_day_value", lag("weighted_avg", 1).over(w))
      .withColumn("previous_poll_date", lag("poll_date", 1).over(w))
      .withColumn("rolling_7day_avg",
        round(avg("weighted_avg").over(w.rowsBetween(-6, 0)), 4))
      .withColumn("rolling_30day_volatility",
        round(stddev_pop("weighted_avg").over(w.rowsBetween(-29, 0)), 4))
      .orderBy("party", "poll_date")
    assertFrameEqual(viaSql, viaDf)
  }

  test("parameterized spark.sql search matches the q45 DataFrame twin " +
    "(P8: values bound, never spliced)") {
    val viaSql = SqlEntry.searchViaSql(t, Seq("red", "blue", "small"))
    val viaDf = graft.operators.Scalars.q45SearchPipeAlts(t)
    assertFrameEqual(viaSql, viaDf)
  }

  test("the bound term folds case like the reference's ILIKE") {
    val mixed = SqlEntry.searchViaSql(t, Seq("ReD", "BLUE", "small"))
      .select("p_partkey", "first_alt", "n_alts")
    val lower = SqlEntry.searchViaSql(t, Seq("red", "blue", "small"))
      .select("p_partkey", "first_alt", "n_alts")
    assert(mixed.except(lower).count() == 0 &&
      lower.except(mixed).count() == 0 && lower.count() > 0)
  }

  test("bound parameters are data: an injection-shaped term matches " +
    "nothing instead of escaping the literal") {
    // the whole point of binding: this term reaches contains() as a
    // VALUE; were it spliced into the text it would be a syntax error
    // (or worse, valid SQL)
    val df = SqlEntry.searchViaSql(t,
      Seq("red' OR '1'='1", "x); DROP TABLE part;--", "small"))
    val matched = df.collect()
    assert(matched.nonEmpty) // 'small' still matches
    assert(matched.forall(_.getString(4) == "small"))
  }

  test("spark.sql langid matches the q176 DataFrame twin frame-level " +
    "(HOF lambdas + the planted corpus derivation through the parser)") {
    assertFrameEqual(SqlEntry.langidViaSql(t),
      graft.operators.Lexicon.q176LexLangid(t))
  }

  test("the full dbt mart chain through the parser: raw → stg → fact → " +
    "both aggregate marts as consecutive spark.sql statements, each " +
    "layer frame-equal to its DataFrame twin") {
    val (fact, standings, daily) = SqlEntry.martChainViaSql(t)
    // fact layer ≡ q22 (dim join + trend windows through view-on-view
    // resolution: fact_polls reads stg_dawum_polls reads raw_dawum_polls)
    assertFrameEqual(fact, Polls.q22PollTrends(t))
    // serving marts read the CHAIN's staging view, not the checkpointed
    // staging table — same values by construction
    assertFrameEqual(standings, Polls.q23PollStandings(t))
    assertFrameEqual(daily, SqlEntry.dailyAveragesViaSql(t))
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
