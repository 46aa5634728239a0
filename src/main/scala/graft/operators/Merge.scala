package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Serve._

/** Upsert / dedup semantics — SURVEY.md §2.10, the reference's hardest
  * correctness pieces:
  *  - D3 sticky-status merge (storage/postgres.py:325-390, migrations/
  *    0002_candidate_status.sql:19-34): rejected and kept are sticky,
  *    pending is promotable; arrays merge distinct; review columns keep the
  *    first non-null; payload takes the newest.
  *  - D5 trigram title dedup (migrations/0006_title_dedup.sql:51-72):
  *    similarity join with blocking, earliest row wins as canonical.
  *  - D7 read-time findings dedup with first-appearance order
  *    (findings.py:99-137): Spark shuffles destroy implicit order, so the
  *    input-order column is explicit (min event_id per group).
  *  - D2 DELETE-then-INSERT upsert (elt/loader_clickhouse.py:530-573).
  *
  * All merges are expressed as joins + per-column policy expressions — no
  * driver-side loops, so they scale with the shuffle, and the policy columns
  * stay inside codegen.
  */
object Merge {

  /** Existing study catalog derived from documents (status cycles through
    * the review lifecycle; topics seeded from source). */
  private def existingStudies(t: T): DataFrame =
    t.documents.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 4 === 1, "kept")
        .when(col("doc_id") % 4 === 2, "rejected")
        .otherwise("pending").as("status"),
      array(col("source")).as("topics"),
      when(col("doc_id") % 3 === 0, concat(lit("note-"), col("doc_id")))
        .otherwise(lit(null).cast("string")).as("review_note"),
      col("n_chars").as("payload_size"))

  /** Incoming batch: every even id re-arrives (changed payload, fresh
    * topics); ids shifted by 100000 for id % 10 == 0 are brand new. */
  private def incomingStudies(t: T): DataFrame = {
    val recrawled = t.documents.filter(col("doc_id") % 2 === 0).select(
      col("doc_id").as("id"),
      lit("pending").as("status"),
      array(concat(lit("t"), col("doc_id") % 5)).as("topics"),
      when(col("doc_id") % 6 === 0, lit("auto-note"))
        .otherwise(lit(null).cast("string")).as("review_note"),
      (col("n_chars") + 7).as("payload_size"))
    val fresh = t.documents.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 100000).as("id"),
      lit("pending").as("status"),
      array(lit("new")).as("topics"),
      lit(null).cast("string").as("review_note"),
      col("n_chars").as("payload_size"))
    recrawled.unionByName(fresh)
  }

  /** q33 — sticky-status merge upsert: full-outer join + per-column merge
    * policies. Topics serialize as a sorted pipe-join (array outputs don't
    * survive the comparison layer; the reference exports lists the same
    * way, study_scraper/export.py:45-86). */
  def q33StickyMerge(t: T): DataFrame =
    stickyMerge(existingStudies(t), incomingStudies(t)).orderBy("id")

  /** The reusable sticky merge: both inputs shaped
    * (id, status, topics, review_note, payload_size). */
  def stickyMerge(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val old = existing.select(
      col("id"), col("status").as("old_status"), col("topics").as("old_topics"),
      col("review_note").as("old_note"), col("payload_size").as("old_size"))
    val inc = incoming.select(
      col("id"), col("status").as("new_status"), col("topics").as("new_topics"),
      col("review_note").as("new_note"), col("payload_size").as("new_size"))
    old.join(inc, Seq("id"), "full_outer")
      .select(
        col("id"),
        // sticky lifecycle: rejected > kept > incoming > old
        when(col("old_status") === "rejected", "rejected")
          .when(col("old_status") === "kept", "kept")
          .otherwise(coalesce(col("new_status"), col("old_status"))).as("status"),
        array_join(array_sort(array_distinct(concat(
          coalesce(col("old_topics"), array()),
          coalesce(col("new_topics"), array())))), "|").as("topics"),
        coalesce(col("old_note"), col("new_note")).as("review_note"),
        coalesce(col("new_size"), col("old_size")).as("payload_size"),
        (col("old_status").isNotNull && col("new_status").isNotNull)
          .as("was_merged"))
  }

  /** q34 — trigram title dedup: per-brand blocking, char-3-gram Jaccard,
    * canonical = earliest partkey; each part maps to its best earlier
    * near-duplicate (sim ≥ 0.5). At 100 TB the block key is what bounds the
    * pair space — brand alone here; production adds a length band. */
  def q34TitleTrigramDedup(t: T): DataFrame = {
    // Blocking = (brand, first char, length div 8): candidates must agree
    // on all three. Near-duplicate titles share their head and have
    // near-equal lengths, so the block costs little recall and divides the
    // pair space ~7× (measured) — the Spark equivalent of the reference's
    // trigram GIN prefilter. The oracle blocks identically (the block key
    // is part of the spec).
    // Similarity is the native TrigramSimilarity expression (registered by
    // GraftExtensions): one pass per pair, no per-row ArrayData — and the
    // join carries two short strings instead of two trigram arrays.
    // Gram sets are materialized ONCE per row (trigram_set) before the
    // self-join; per pair the similarity is then an allocation-free
    // sorted merge (trigram_sim_sorted) instead of rebuilding both hash
    // sets — a row in a ~300-candidate block paid that rebuild ~300×.
    // Value-identical to trigram_similarity(name_a, name_b) by
    // construction (same distinct sets, same |∩|/|∪|; property-pinned).
    val named = t.part
      .withColumn("name", lower(col("p_name")))
      .filter(length(col("name")) >= 3)
      .select(col("p_partkey"), col("p_brand"),
        substring(col("name"), 1, 1).as("head"),
        expr("length(name) div 8").as("len_band"),
        expr("trigram_set(name)").as("grams"))
    // The build side broadcasts (the 180 KB part file), so pair fan-out
    // parallelism is the PROBE side's partitioning — one scan task for a
    // single small local file, i.e. a near-serial gram-merge walk. The
    // sub-MB probe repartition spreads pair generation across every core
    // (same single-file compensation as q60 / Tables.cpuHeavyKeys; a
    // production multi-file root scans parallel already).
    val pairs = named.select(col("p_partkey").as("key_b"), col("p_brand").as("brand"),
        col("head"), col("len_band"), col("grams").as("grams_b"))
      .repartition(t.spark.sparkContext.defaultParallelism)
      .join(broadcast(named.select(col("p_partkey").as("key_a"), col("p_brand").as("brand"),
        col("head"), col("len_band"), col("grams").as("grams_a"))),
        Seq("brand", "head", "len_band"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("sim", expr("trigram_sim_sorted(grams_a, grams_b)"))
      .filter(col("sim") >= 0.5)
    val best = Window.partitionBy("key_b")
      .orderBy(col("sim").desc, col("key_a").asc)
    pairs
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("key_b").as("p_partkey"), col("key_a").as("dup_of"), col("sim"))
      // materialize once before the serving sort — see Polls.q22PollTrends
      .localCheckpoint(false)
      .orderBy("p_partkey")
  }

  /** q97 — the DECLARED similarity join: the query states the naive
    * `trigram_similarity(a, b) >= 0.55` predicate and nothing else; the
    * SimilarityJoinRewrite optimizer rule (registered by GraftExtensions,
    * `plans/SimilarityJoinRewrite.scala`) plans it as the EXACT
    * prefix-filtered equi-join, so the declared form scales like q34's
    * hand-blocked pipeline without the user writing the blocking. Same
    * corpus as q34 but exact semantics — every within-brand pair with
    * trigram Jaccard ≥ 0.55, no heuristic head/length blocking — which is
    * also why the oracle is a straight blocked pair join in SQL.
    * SimilarityJoinRewriteSpec pins rewrite = naive equality, plan shape,
    * multiplicity, and edge semantics. */
  def q97SimilarityJoin(t: T): DataFrame = {
    val named = t.part
      .filter(length(col("p_name")) >= 3)
      .select(col("p_partkey"), col("p_brand"), lower(col("p_name")).as("name"))
    val a = named.select(col("p_partkey").as("key_a"), col("p_brand").as("brand"),
      col("name").as("name_a"))
    val b = named.select(col("p_partkey").as("key_b"), col("p_brand").as("brand_b"),
      col("name").as("name_b"))
    a.join(b, col("brand") === col("brand_b") && col("key_a") < col("key_b") &&
        expr("trigram_similarity(name_a, name_b) >= 0.55"))
      .select(col("key_a"), col("key_b"),
        round(expr("trigram_similarity(name_a, name_b)"), 6).as("sim"))
      .orderBy("key_a", "key_b")
  }

  /** q35 — read-time findings dedup preserving first-appearance order:
    * group on the normalized identity, keep the strongest row
    * (value, ts, event_id ordering), carry dup_count, and order the output
    * by each group's first appearance (min event_id) — the O5 semantics
    * that implicit row order cannot provide after a shuffle. */
  def q35FindingsDedup(t: T): DataFrame =
    t.events
      .withColumn("val_key", round(col("value"), 0).cast("long"))
      .groupBy("user_id", "event_type", "val_key")
      .agg(
        max_by(struct(col("event_id"), col("value"), col("ts")),
          struct(col("value"), col("ts"), col("event_id"))).as("kept"),
        count(lit(1)).as("dup_count"),
        min("event_id").as("first_seen"))
      .select(
        col("first_seen"), col("user_id"), col("event_type"),
        col("kept.event_id").as("kept_event_id"),
        col("kept.value").as("kept_value"),
        col("dup_count"))
      .orderBy("first_seen")

  /** q55 — DOI dedup redirect (D4, storage/postgres.py:228-270): incoming
    * studies whose DOI already exists under a different id adopt the
    * earliest existing id as canonical and their topics merge into it.
    * Expressed as a window-min per DOI + redirect classification — the
    * decorrelated form of the reference's per-row lookup. */
  def q55DoiDedup(t: T): DataFrame = {
    val studies = t.documents.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 7 === 0,
        concat(lit("doi-"), col("doc_id") % 40)).as("doi"),
      col("source"))
    // canonical map built only over rows WITH a doi, then joined back —
    // a window over the full set would put every null-doi row in one
    // partition (the classic null-key skew cliff at scale)
    val doiMin = studies.filter(col("doi").isNotNull)
      .groupBy("doi").agg(min("id").as("canonical_of_doi"))
    studies
      .join(broadcast(doiMin), Seq("doi"), "left")
      .withColumn("canonical_id",
        coalesce(col("canonical_of_doi"), col("id")))
      .withColumn("was_redirected", col("canonical_id") =!= col("id"))
      .groupBy("canonical_id")
      .agg(
        count(lit(1)).as("n_merged"),
        count(when(col("was_redirected"), 1)).as("n_redirected"),
        array_join(sort_array(collect_set(col("source"))), "|").as("sources"),
        max("doi").as("doi"))
      .orderBy("canonical_id")
  }

  /** DOI surface-form normalization (T12, study_scraper/pipeline.py:
    * 115-131 `_normalize_doi`): trim, then strip ONE leading
    * `https://doi.org/` / `http://doi.org/` / `doi:` prefix
    * (case-insensitively matched, remainder case-preserved), empty → null.
    * Pure codegen'd regexp — no UDF. */
  def normalizeDoi(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    nullif(regexp_replace(trim(c), "(?i)^(https?://doi\\.org/|doi:)", ""), lit(""))

  /** q62 — the normalizer over every surface form the reference sees
    * (pipeline.py docstring): bare, doi:-prefixed, https/HTTP url forms,
    * padded whitespace, and blank → null. */
  def q62DoiNormalize(t: T): DataFrame = {
    val raw =
      when(col("doc_id") % 11 === 0, lit("  "))
        .when(col("doc_id") % 4 === 0,
          concat(lit("https://doi.org/10.1515/d"), col("doc_id")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("doi:10.1515/d"), col("doc_id")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("  10.1515/d"), col("doc_id"), lit(" ")))
        .otherwise(concat(lit("HTTP://doi.org/10.1515/D"), col("doc_id")))
    t.documents
      .select(col("doc_id"), raw.as("raw"))
      .withColumn("doi", normalizeDoi(col("raw")))
      .withColumn("has_doi", col("doi").isNotNull)
      .withColumn("is_bare", coalesce(col("doi").startsWith("10."), lit(false)))
      .orderBy("doc_id")
  }

  /** q36 — DELETE-then-INSERT upsert: incoming batch hard-replaces by key
    * (anti-join survivors ∪ incoming), checked via per-status rollup. */
  def q36DeleteInsertUpsert(t: T): DataFrame = {
    // Price bump by a binary-exact 2-dp constant: a multiplicative bump
    // would need re-rounding, and round-half behavior on inexact products
    // is engine-specific (measured: 5¢ drift over 1500 rows vs DuckDB).
    val incoming = t.orders
      .filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.25)
      .withColumn("o_orderstatus", lit("U"))
    val survivors = t.orders.join(
      incoming.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    survivors.unionByName(incoming)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct("o_orderkey").as("n_keys"),
        round(sum("o_totalprice"), 2).as("volume"))
      .smallSort("o_orderstatus")
  }
}
