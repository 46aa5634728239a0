package graft

import graft.Tables.T
import org.apache.spark.sql.DataFrame

/** Optional SQL entry point on top of the DataFrame core (SURVEY §7.0:
  * "No string-SQL in the core; SQL entry point optional on top") — the
  * last open end of §7. The engine's operators stay pure
  * `DataFrame => DataFrame`; this object only (a) exposes the lake and
  * staging frames as session-scoped temp views and (b) ports P11, the
  * reference's view-name identifier guard (study_scraper/storage/
  * postgres.py:1320-1336: "Limited to view names that look like
  * identifiers so a caller typo can't smuggle SQL through"), to the one
  * place in this codebase where caller-supplied strings meet SQL text.
  *
  * Everything a `spark.sql` user needs beyond the views — the native
  * functions (max2, vec_dot, trigram_similarity, …) — already arrives
  * through GraftExtensions, the public extension point; SqlEntrySpec
  * proves parity by running the reference's latest_poll_standings model
  * (dbt_project/models/marts/aggregates/latest_poll_standings.sql, the
  * W5–W7 showcase) through `spark.sql` and asserting frame-level
  * equality with its DataFrame twin (Polls.q23PollStandings). */
object SqlEntry {

  /** P11 — identifier guard. Stricter than the reference's
    * `replace("_", "").isalnum()` (which admits a leading digit and
    * non-ASCII alphanumerics): ASCII letters/digits/underscore, must
    * not start with a digit, bounded length. Throws on violation —
    * same contract as the reference's ValueError. */
  def requireIdentifier(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]{0,127}"),
      s"invalid SQL identifier: '$name'")
    name
  }

  /** Register the ten lake tables plus the poll staging fact
    * (`stg_poll_results` — the dbt staging model every mart reads) as
    * temp views, names validated through the P11 guard. Temp views are
    * session-scoped, so concurrent sessions don't collide. */
  def registerViews(t: T): Unit = {
    Tables.names.foreach { n =>
      Tables.load(t.spark, t.sfDir, n)
        .createOrReplaceTempView(requireIdentifier(n))
    }
    operators.Polls.stgPollResultsTable(t)
      .createOrReplaceTempView(requireIdentifier("stg_poll_results"))
  }

  /** The reference's query_view shape (postgres.py:1320-1336): read N
    * rows from a registered view, view name validated so a caller typo
    * can't smuggle SQL through; the limit rides as a literal int, not
    * interpolated text. */
  def queryView(spark: org.apache.spark.sql.SparkSession, viewName: String,
                limit: Int = 50): DataFrame =
    spark.table(requireIdentifier(viewName)).limit(limit)

  /** latest_poll_standings (the q23 model) as ANSI SQL over the
    * registered views — the translated reference mart run through
    * `spark.sql`. Kept semantically identical to the DataFrame twin:
    * max2 picks latest+previous in one aggregation pass, the 180-day
    * recency window keys on the staged watermark (computed in-query
    * here; q23 folds the staging-time scalar — same value by
    * construction), share-of-total among majors over an empty window
    * frame, global rank. Parameterized on the staging table so the
    * mart CHAIN (martChainViaSql) can point the same model at its own
    * SQL-built staging view. */
  def standingsSqlOver(stg: String): String =
    s"""WITH wm AS (SELECT max(poll_date) AS d FROM ${requireIdentifier(stg)}),
      |agg AS (
      |  SELECT party,
      |    max2(struct(poll_date, poll_id, pct)) AS m12,
      |    count(1) AS n_polls,
      |    count(DISTINCT institute_id) AS n_institutes,
      |    round(sum(CASE WHEN poll_date >= wm.d - INTERVAL 180 DAYS
      |        THEN pct END), 2)
      |      / count(CASE WHEN poll_date >= wm.d - INTERVAL 180 DAYS
      |        THEN 1 END) AS avg_180d,
      |    round(stddev_pop(CASE WHEN poll_date >= wm.d - INTERVAL 180 DAYS
      |        THEN pct END), 4) AS volatility_180d
      |  FROM ${requireIdentifier(stg)} CROSS JOIN wm
      |  GROUP BY party),
      |pp AS (
      |  SELECT party,
      |    m12.first.pct AS latest_pct,
      |    m12.first.poll_date AS latest_date,
      |    m12.second.pct AS prev_pct,
      |    n_polls, n_institutes, avg_180d, volatility_180d
      |  FROM agg)
      |SELECT
      |  row_number() OVER (ORDER BY latest_pct DESC, party ASC) AS rank,
      |  party, latest_pct, latest_date, prev_pct,
      |  n_polls, n_institutes, avg_180d, volatility_180d,
      |  latest_pct * 100.0
      |    / round(sum(CASE WHEN latest_pct >= 10 THEN latest_pct END)
      |        OVER (), 2) AS share_pct
      |FROM pp
      |ORDER BY rank""".stripMargin

  val q23StandingsSql: String = standingsSqlOver("stg_poll_results")

  /** Run the translated model: register views, execute the SQL. */
  def q23ViaSql(t: T): DataFrame = {
    registerViews(t)
    t.spark.sql(q23StandingsSql)
  }

  /** daily_poll_averages (dbt_project/models/marts/aggregates/
    * daily_poll_averages.sql:60-88) as ANSI SQL — the W1/W2/W3
    * ROWS-frame showcase: per-(party, day) aggregate with the
    * sample-size-weighted mean, then lag, the 7-row rolling average
    * and the 30-row rolling volatility over named windows.
    * SqlEntrySpec asserts frame equality against a Window-API twin
    * built from the same staged view — proving the named-WINDOW +
    * frame-spec SQL surface computes exactly what the DataFrame core
    * does. Parameterized on the staging table like
    * [[standingsSqlOver]]. */
  def dailyAveragesSqlOver(stg: String): String =
    s"""WITH daily AS (
      |  SELECT party, poll_date,
      |    count(1) AS poll_count,
      |    round(avg(pct), 4) AS avg_pct,
      |    round(sum(pct * surveyed) / sum(surveyed), 4) AS weighted_avg,
      |    CAST(sum(surveyed) AS BIGINT) AS total_surveyed,
      |    count(DISTINCT institute_id) AS unique_institutes
      |  FROM ${requireIdentifier(stg)}
      |  GROUP BY party, poll_date)
      |SELECT party, poll_date, poll_count, avg_pct, weighted_avg,
      |  total_surveyed, unique_institutes,
      |  lag(weighted_avg, 1) OVER w AS previous_day_value,
      |  lag(poll_date, 1) OVER w AS previous_poll_date,
      |  round(avg(weighted_avg) OVER w7, 4) AS rolling_7day_avg,
      |  round(stddev_pop(weighted_avg) OVER w30, 4)
      |    AS rolling_30day_volatility
      |FROM daily
      |WINDOW
      |  w AS (PARTITION BY party ORDER BY poll_date),
      |  w7 AS (PARTITION BY party ORDER BY poll_date
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |  w30 AS (PARTITION BY party ORDER BY poll_date
      |    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
      |ORDER BY party, poll_date""".stripMargin

  val dailyAveragesSql: String = dailyAveragesSqlOver("stg_poll_results")

  def dailyAveragesViaSql(t: T): DataFrame = {
    registerViews(t)
    t.spark.sql(dailyAveragesSql)
  }

  // ── the FULL dbt mart chain through the parser (r17 verdict item 4) ──

  /** raw_dawum_polls as SQL over the lake views — the reference's raw
    * model (dbt_project/models/staging: projection + validity
    * predicates over the ingested poll documents), building the SAME
    * JSON `results` payload Polls.rawPolls derives: per-(poll, party)
    * summed pcts, sort_array for deterministic map key order, one JSON
    * object per poll. */
  val rawDawumPollsViewSql: String =
    """CREATE OR REPLACE TEMPORARY VIEW raw_dawum_polls AS
      |WITH per_party AS (
      |  SELECT l_orderkey, concat('p', l_linenumber) AS party,
      |    sum(l_quantity) AS pct
      |  FROM lineitem GROUP BY l_orderkey, concat('p', l_linenumber)),
      |results AS (
      |  SELECT l_orderkey, to_json(map_from_entries(sort_array(
      |    collect_list(struct(party, pct))))) AS results
      |  FROM per_party GROUP BY l_orderkey)
      |SELECT o_orderkey AS poll_id, o_custkey AS institute_id,
      |  o_orderdate AS poll_date, o_totalprice AS surveyed, results
      |FROM orders JOIN results ON o_orderkey = l_orderkey
      |WHERE o_orderkey IS NOT NULL AND results != ''""".stripMargin

  /** stg_dawum_polls as SQL over raw_dawum_polls — the staging model
    * (stg_dawum_polls.sql:29-115): JSON map parse + validity filter,
    * the map unpivot, quality flags, and the deterministic row hash
    * (pct scaled to an integer before hashing — the 2-dp money
    * semantics Polls.stgPollResults uses, so the two surfaces hash
    * identical text). */
  val stgDawumPollsViewSql: String =
    """CREATE OR REPLACE TEMPORARY VIEW stg_dawum_polls AS
      |SELECT poll_id, institute_id, poll_date, surveyed,
      |  entry.key AS party, entry.value AS pct,
      |  entry.value >= 0 AND entry.value <= 100 AS pct_valid,
      |  CASE WHEN entry.value < 10 THEN 'fringe'
      |    WHEN entry.value < 25 THEN 'minor'
      |    WHEN entry.value < 45 THEN 'major'
      |    ELSE 'landslide' END AS quality_tier,
      |  sha2(concat_ws('|', poll_id, entry.key,
      |    CAST(round(entry.value * 100, 0) AS BIGINT)), 256) AS row_hash
      |FROM (
      |  SELECT poll_id, institute_id, poll_date, surveyed,
      |    explode(map_entries(rmap)) AS entry
      |  FROM (SELECT *, from_json(results, 'map<string,double>') AS rmap
      |        FROM raw_dawum_polls)
      |  WHERE rmap IS NOT NULL)""".stripMargin

  /** fact_polls as SQL over stg_dawum_polls + the institute dim — the
    * fact model (fact_polls.sql:50-102): dim join, lag/moving-average
    * trend windows over named WINDOW clauses, direction bucketing.
    * Semantically identical to Polls.q22PollTrends. */
  val factPollsViewSql: String =
    """CREATE OR REPLACE TEMPORARY VIEW fact_polls AS
      |SELECT poll_id, party, c_name AS institute_name,
      |  c_mktsegment AS institute_group, pct,
      |  lag(pct, 1) OVER w AS prev_pct,
      |  round(pct - lag(pct, 1) OVER w, 2) AS delta,
      |  round(sum(pct) OVER w3, 2) / count(1) OVER w3 AS ma3,
      |  CASE WHEN lag(pct, 1) OVER w IS NULL THEN 'new'
      |    WHEN pct - lag(pct, 1) OVER w > 2.0D THEN 'up'
      |    WHEN pct - lag(pct, 1) OVER w < -2.0D THEN 'down'
      |    ELSE 'stable' END AS trend
      |FROM stg_dawum_polls JOIN customer ON institute_id = c_custkey
      |WINDOW
      |  w AS (PARTITION BY party, institute_id ORDER BY poll_date, poll_id),
      |  w3 AS (PARTITION BY party, institute_id ORDER BY poll_date, poll_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  /** The WHOLE reference mart chain (raw_dawum_polls → stg_dawum_polls
    * → fact_polls → both aggregate marts) as CONSECUTIVE `spark.sql`
    * statements over temp views — multi-statement view-on-view
    * resolution through the parser, the one SQL-surface shape the
    * single-statement parity models don't exercise. Returns (fact,
    * standings, daily) — each frame-equal to its DataFrame twin
    * (q22PollTrends / q23PollStandings / the q22-family daily model;
    * SqlEntrySpec pins all three). Views are lazy (each consumer
    * re-resolves the chain — dbt would materialize each layer; the
    * staging-table cost discipline lives in Polls.stgPollResultsTable,
    * this chain proves the SURFACE). */
  def martChainViaSql(t: T): (DataFrame, DataFrame, DataFrame) = {
    registerViews(t)
    t.spark.sql(rawDawumPollsViewSql)
    t.spark.sql(stgDawumPollsViewSql)
    t.spark.sql(factPollsViewSql)
    (t.spark.table("fact_polls"),
      t.spark.sql(standingsSqlOver("stg_dawum_polls")),
      t.spark.sql(dailyAveragesSqlOver("stg_dawum_polls")))
  }

  /** P8 through the SQL surface — the q45 pipe-alternative search
    * (storage/postgres.py:884-919) with the caller's search terms
    * entering as BIND PARAMETERS (`:alt0`…), never interpolated into
    * the SQL text: the parameterized-`spark.sql` analogue of the
    * reference's psycopg parameter binding, and the second half of the
    * P11 story (identifiers validated, values bound). Shape matches
    * the DataFrame twin: per-alternative filter legs, UNION ALL,
    * identity-tuple dedup with first-alternative retention. Both
    * SIDES of the match fold case (the reference's ILIKE is
    * case-insensitive; a caller's "Red" must match like "red"),
    * while the emitted `alt` column carries the caller's spelling. */
  val searchAltsSql: String =
    """WITH hits AS (
      |  SELECT p_partkey, p_name, 0 AS alt_idx, :alt0 AS alt
      |  FROM part WHERE contains(lower(p_name), lower(:alt0))
      |  UNION ALL
      |  SELECT p_partkey, p_name, 1 AS alt_idx, :alt1 AS alt
      |  FROM part WHERE contains(lower(p_name), lower(:alt1))
      |  UNION ALL
      |  SELECT p_partkey, p_name, 2 AS alt_idx, :alt2 AS alt
      |  FROM part WHERE contains(lower(p_name), lower(:alt2)))
      |SELECT p_partkey, p_name,
      |  min(alt_idx) AS first_alt,
      |  count(1) AS n_alts,
      |  array_join(sort_array(collect_set(alt)), ',') AS alts_matched
      |FROM hits
      |GROUP BY p_partkey, p_name
      |ORDER BY p_partkey""".stripMargin

  def searchViaSql(t: T, alts: Seq[String]): DataFrame = {
    require(alts.length == 3, "the declared query binds three alternatives")
    registerViews(t)
    t.spark.sql(searchAltsSql,
      Map("alt0" -> alts(0), "alt1" -> alts(1), "alt2" -> alts(2)))
  }

  /** The q176 langid confusion matrix as ONE `spark.sql` statement —
    * the fourth parity model, chosen because it exercises the surface
    * area the first three don't: higher-order array lambdas (filter
    * with `IN`, a λ inside an aggregate input) and the whole planted
    * in-query corpus derivation (transform/sequence/named_struct
    * chains) through the SQL PARSER rather than `expr()` fragments.
    * Built from the same Scala definitions (Lexicon.multiLexTextSparkSql,
    * topWords) as the operator and its oracle, so the three renderings
    * cannot drift independently; SqlEntrySpec asserts frame equality
    * with Lexicon.q176LexLangid. */
  def langidSql: String = {
    import operators.Lexicon
    val hits = Lexicon.MultiLangs.zipWithIndex.map { case (l, i) =>
      val lits = Lexicon.topWords(i, Lexicon.LangidK)
        .map(w => s"'$w'").mkString(", ")
      s"    size(filter(words, w -> w IN ($lits))) AS s_$l"
    }.mkString(",\n")
    s"""WITH mlex AS (
       |  SELECT doc_id, lang, ${Lexicon.multiLexTextSparkSql} AS text
       |  FROM documents),
       |tok AS (
       |  SELECT lang,
       |    filter(split(lower(trim(text)), '\\\\s+'), x -> x != '') AS words
       |  FROM mlex),
       |sc AS (
       |  SELECT lang, size(words) AS n_words,
       |$hits
       |  FROM tok),
       |p AS (
       |  SELECT lang, n_words,
       |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
       |      WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
       |      WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
       |      WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted_lang,
       |    greatest(s_de, s_en, s_es, s_fr, s_zh) AS best_hits
       |  FROM sc)
       |SELECT lang AS true_lang, predicted_lang,
       |  count(1) AS n_docs,
       |  sum(n_words) AS sum_words,
       |  sum(best_hits) AS sum_hits
       |FROM p GROUP BY true_lang, predicted_lang
       |ORDER BY true_lang, predicted_lang""".stripMargin
  }

  def langidViaSql(t: T): DataFrame = {
    registerViews(t)
    t.spark.sql(langidSql)
  }
}
