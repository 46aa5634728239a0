package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heterogeneous-source views and monitoring operators:
  *  - U1 unified metadata view (sql/create_datasets_unified_view.sql:4-75):
  *    four differently-shaped sources projected to one schema + unionByName,
  *    with multiIf/coalesce derived columns.
  *  - J2/A6 catalog query (sql/select_topic_dataset_catalog.sql:9-22):
  *    argMax-latest row per key (9 columns at once via one max_by struct)
  *    LEFT JOINed to an aggregate on a two-column key.
  *  - M1/M2 snapshot diff (study_scraper/digest.py:58-139): two point-in-
  *    time aggregates full-outer joined; shifts ≥ threshold, new and gone
  *    keys classified.
  */
object Views {

  /** q40 — unified entity view over customer/supplier/part/nation. */
  def q40UnifiedView(t: T): DataFrame = {
    def shape(src: String, id: org.apache.spark.sql.Column, name: org.apache.spark.sql.Column,
              geo: org.apache.spark.sql.Column, sz: org.apache.spark.sql.Column,
              bal: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
      df.select(lit(src).as("source"), id.cast("long").as("entity_id"),
        name.as("name"), geo.cast("int").as("geo_key"),
        sz.cast("int").as("size_attr"), bal.cast("double").as("acctbal"))
    val unified =
      shape("customer", col("c_custkey"), col("c_name"), col("c_nationkey"),
        lit(null), col("c_acctbal"))(t.customer)
        .unionByName(shape("supplier", col("s_suppkey"), col("s_name"),
          col("s_nationkey"), lit(null), col("s_acctbal"))(t.supplier))
        .unionByName(shape("part", col("p_partkey"), col("p_name"),
          lit(null), col("p_size"), col("p_retailprice"))(t.part))
        .unionByName(shape("nation", col("n_nationkey"), col("n_name"),
          col("n_regionkey"), lit(null), lit(null))(t.nation))
    unified
      .withColumn("entity_class", // multiIf (P5)
        when(col("source") === "nation", "geo")
          .when(col("acctbal").isNull, "item")
          .when(col("acctbal") < 0, "account_negative")
          .otherwise("account"))
      .withColumn("display_name", // coalesce/nullif (P6)
        coalesce(nullif(col("name"), lit("")), lit("(unnamed)")))
      .withColumn("name_len", length(col("name")))
      .withColumn("has_geo", col("geo_key").isNotNull)
      .orderBy("source", "entity_id")
  }

  /** q41 — catalog latest-row query: one max_by struct carries every
    * payload column at once (the argMax-of-9-columns pattern), joined on a
    * two-column key to per-key totals. */
  def q41CatalogArgmax(t: T): DataFrame = {
    val latest = t.events
      .groupBy("user_id", "event_type")
      .agg(
        max_by(struct(col("event_id"), col("value"), col("props")),
          struct(col("ts"), col("event_id"))).as("last"),
        max("ts").as("last_ts"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("last_value"),
        col("last.props").as("last_props"),
        col("last_ts"))
    val totals = t.events
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    latest
      .join(totals, Seq("user_id", "event_type"), "left")
      .orderBy("user_id", "event_type")
  }

  /** q39 — snapshot diff: first-half vs second-half aggregates per
    * (event_type, user bucket), classified new/gone/shift/stable with a
    * 5-point shift threshold (digest.py:97-139). */
  def q39SnapshotDiff(t: T): DataFrame = {
    val mid = lit("2024-01-16").cast("timestamp")
    def snap(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), (col("user_id") % 10).as("cohort"))
      .agg((round(sum("value"), 2) / count(lit(1))).as("avg_value"))
    val a = snap(t.events.filter(col("ts") < mid))
      .withColumnRenamed("avg_value", "prev_value")
    val b = snap(t.events.filter(col("ts") >= mid))
      .withColumnRenamed("avg_value", "cur_value")
    a.join(b, Seq("event_type", "cohort"), "full_outer")
      .withColumn("status",
        when(col("prev_value").isNull, "new")
          .when(col("cur_value").isNull, "gone")
          .when(abs(col("cur_value") - col("prev_value")) >= 5.0, "shift")
          .otherwise("stable"))
      .withColumn("delta", round(col("cur_value") - col("prev_value"), 4))
      .select("event_type", "cohort", "prev_value", "cur_value", "delta", "status")
      .orderBy("event_type", "cohort")
  }

  /** q60 — FUZZY snapshot matching (J13, study_scraper/digest.py:75-94
    * `_match_prev`): a current snapshot row finds last run's row by exact
    * (position, population) — a 55→70 "shift" across populations is sample
    * composition, not opinion change — plus the BEST label similarity,
    * kept only at ≥ 0.72 (the reference's DEFAULT_THRESHOLD). Unmatched
    * rows are new questions; matched ones classify shift/stable on a
    * 5-point delta, as in q39's keyed diff.
    *
    * The snapshots derive from `part`: prev labels are the part names,
    * current labels carry a suffix mutation (the re-clustered label drift
    * the fuzzy match exists for). Similarity is the native codegen'd
    * TrigramSimilarity expression; the exact-key block bounds the pair
    * space (position × population), which is exactly the reference's loop
    * structure — candidate generation by equi-join, never all-pairs.
    *
    * DOCUMENTED DIVERGENCE: the reference matches labels with
    * `question_similarity` (the concept-folded sparse cosine of
    * digest.py:91 / clustering.py) where this query uses trigram
    * similarity at the same 0.72 threshold. Trigram is
    * oracle-replayable (DuckDB computes the identical score; the cosine's
    * concept map is not expressible there) and is a stricter
    * character-level matcher for the label-drift case; callers who need
    * reference-exact match behavior can swap in
    * Clustering.questionSimilarity via a UDF at the same threshold. */
  def q60SnapshotFuzzy(t: T): DataFrame = {
    val base = t.part
      .filter(col("p_partkey") % 5 === 0)
      .withColumn("position",
        when(col("p_partkey") % 3 === 0, "support")
          .when(col("p_partkey") % 3 === 1, "oppose")
          .otherwise("neutral"))
      .withColumn("population",
        when(col("p_partkey") % 4 === 0, "ost").otherwise(""))
      .withColumn("pct_prev", (col("p_partkey") % 90 + 5).cast("double"))
    // Per-side gram sets once per row, allocation-free merge per pair —
    // same split as q34 (see Merge.q34TitleTrigramDedup).
    val prev = base.filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("prev_key"), col("position"), col("population"),
        expr("trigram_set(lower(p_name))").as("prev_grams"),
        col("pct_prev").as("prev_pct"))
    val cur = base.select(
      col("p_partkey").as("cur_key"), col("position"), col("population"),
      expr("trigram_set(concat(lower(p_name), ' neu'))").as("cur_grams"),
      (col("pct_prev") +
        when(col("p_partkey") % 9 === 0, 7.0).otherwise(1.0)).as("cur_pct"))
    val best = Window.partitionBy("cur_key")
      .orderBy(col("sim").desc, col("prev_key").asc)
    // The prev side broadcasts (2 k rows), so pair fan-out parallelism is
    // set by the PROBE side's partitioning — and `part` is one small local
    // file, i.e. one scan task: the 1.3 M-pair gram-merge walk (the
    // query's dominant cost, ~1.2 s of 1.5 s measured) ran nearly serial.
    // An explicit sub-MB repartition of the 4 k probe rows spreads the
    // pair generation across every core. (Same single-file-local-testdata
    // compensation as Tables.cpuHeavyKeys; a production multi-file table
    // root scans parallel already. A salted join was measured instead and
    // is WRONG here: with a broadcast build there is no key-skew to break,
    // and replicating the build side only added rows.)
    val matched = cur
      .repartition(t.spark.sparkContext.defaultParallelism)
      .join(broadcast(prev), Seq("position", "population"))
      .withColumn("sim", expr("trigram_sim_sorted(cur_grams, prev_grams)"))
      .filter(col("sim") >= 0.72)
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("cur_key"), col("prev_key"),
        round(col("sim"), 4).as("sim"), col("prev_pct"))
    cur
      .join(matched, Seq("cur_key"), "left")
      .withColumn("delta", round(col("cur_pct") - col("prev_pct"), 1))
      .withColumn("status",
        when(col("prev_key").isNull, "new")
          .when(abs(col("cur_pct") - col("prev_pct")) >= 5.0, "shift")
          .otherwise("stable"))
      .select("cur_key", "position", "population", "cur_pct",
        "prev_key", "sim", "prev_pct", "delta", "status")
      // materialize once before the serving sort — see Polls.q22PollTrends
      .localCheckpoint(false)
      .orderBy("cur_key")
  }
}
