package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan audit over every declared query: the 100 TB rules in
  * README ("candidate generation is an equi-join, never all-pairs") must
  * hold structurally, not just by review. Any future edit that lets a
  * join degrade to a cartesian or nested-loop product fails here before
  * it ships. Queries whose CONSTRUCTION already executes jobs (driver
  * clustering, iterative CC) are exercised by their own specs/goldens and
  * skipped — this spec only plans, never runs, the declarative ones. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // fn() itself runs Spark jobs for these (bounded driver paths /
  // iterative CC with checkpoints / the q92 streaming round-trip, whose
  // returned frame is just the sink readback scan — nothing to audit) —
  // covered by Golden/Clustering/Sessions specs.
  private val imperative = Set(
    "q46_question_clusters", "q47_semantic_filter", "q67_clusters_at_scale",
    "q92_streaming_sessions", "q96_stateful_runs", "q98_streaming_neardup",
    "q99_stream_join", "q102_streaming_window", "q106_stream_enrich",
    "q110_streaming_upsert",
    // r12: the markdown products collect their bounded aggregate at
    // construction (driver-side rendering is the product's contract);
    // the aggregates beneath them are q64's (audited) and a plain
    // groupBy — covered by their oracle rows.
    "q112_digest_markdown", "q113_gap_markdown",
    // eager at construction too (r12 review): q114 runs the CSV export +
    // manifest write and q134 a full AvailableNow streaming round-trip —
    // the returned frame is only the readback scan, nothing to audit;
    // covered by SourcesSpec/StreamingHllSpec and their oracle rows
    "q114_export_manifest", "q134_streaming_hll",
    // q140 is q134's AvailableNow round-trip shape for the quantile
    // sketch — the returned frame is the sink readback; covered by
    // StreamingQuantilesSpec and its oracle row
    "q140_streaming_quantiles",
    // q188 runs store training + the AvailableNow metering round-trip
    // at construction — the returned frame is the sink readback;
    // covered by TokenMeterSpec and its oracle row
    "q188_lex_stream_token_meter")

  // Intentional non-equi broadcast joins, each against a frame that is
  // tiny BY CONSTRUCTION — reviewed and allowed by name so a new one
  // cannot slip in silently:
  //   q16/q83/q85/q91    — broadcast 1-row global aggregate (watermark /
  //                        total-tokens / corpus-stats scalar) joined to
  //                        every row (q23/q38 left this list in r11:
  //                        their watermark is now a staging-time scalar)
  //   q48/q49/q64        — broadcast bounded taxonomy / gold / watch frame
  //                        scored against each row (tens of rows)
  //   q25                — brute-force cosine baseline: broadcast QUERY
  //                        side × corpus is the documented all-pairs
  //                        correctness reference for the ANN variants
  //   q58                — broadcast centroid table probed per embedding
  //                        (IVF nprobe=1; centroid count is fixed)
  //   q103               — THE salting pattern: the dim side crossJoins
  //                        the 8-row salt table (one replica per salt)
  //   q118               — the q85 stats scalar (lexical leg) + the
  //                        broadcast 1-row query embedding (dense leg,
  //                        q25's documented shape) (r12)
  //   q122               — decontamination's asymmetric broadcast: the
  //                        EVAL side is bounded by construction (an eval
  //                        suite, not a corpus) and streams against the
  //                        train side map-side (r12)
  //   q131               — broadcast 1-row bloom bit array (2 KiB by
  //                        construction) tested map-side against every
  //                        train gram — the pre-filter pushdown IS the
  //                        point of the query (r12)
  //   q132               — the lang-pair sketch join: 5 rows × 5 rows of
  //                        2 KiB KMV arrays under a < predicate; both
  //                        sides post-aggregate-small by construction
  //                        (r12)
  //   q133               — the pipeline's contamination stage runs
  //                        q131's broadcast 1-row bloom pre-filter (r12)
  //   q138               — broadcast 1-row bounds/box scalar joined to
  //                        every row map-side (the q16/q83 pattern) (r12)
  //   q141               — broadcast 1-row corpus-count scalar (term
  //                        selection) + the 4-row probe-term frame
  //                        against the 32-row bloom stats frame — the
  //                        planner-side pruning pass, no data-side
  //                        cartesian (r12)
  // r13 removals, reviewed: q137 and q139 no longer plan ANY nested-loop
  // join — q137's merge check and rank guide moved to driver arithmetic
  // on the collected ≤5-row sketch (literal local relations now), and
  // q139's node-count scalar is a driver-collected literal instead of a
  // 1-row broadcast crossJoin. q142 runs its bounded Lloyd collects at
  // construction (k·d model state — the MLlib contract) but its RETURNED
  // report plan is fully declarative and audited here: map-side literal-
  // centroid assignment, two aggregates, one broadcast EQUI-join.
  //   q147               — the recall audit's brute-truth leg is q25's
  //                        documented broadcast-query-slice shape (the
  //                        offline recall evaluation, not the serving
  //                        path; the searched leg stays an equi-join)
  //                        (r13)
  //   q154               — BOTH legs are that same bounded offline
  //                        recall-evaluation shape by design: the query
  //                        measures what the JL projection costs in
  //                        recall, so projected top-k AND full-dim truth
  //                        each broadcast the 10-row query slice against
  //                        the corpus (three BNLJ nodes: two scoring
  //                        legs + the vec_id<>query_id self-exclusion
  //                        reuse). The SERVING path for projected
  //                        vectors is the q143 IVF build over them —
  //                        this query is its eval harness (r14)
  //   q157               — same adjudication as q147: the exact-L2
  //                        brute-truth leg broadcasts the 10-row query
  //                        slice (the bounded offline recall audit);
  //                        the ADC serving leg stays a list-bucketed
  //                        equi-join over PQ codes (r15)
  //   q158               — the composed JL→IVF path: the SERVING leg is
  //                        a list-bucketed equi-join in projected space;
  //                        the JL-brute single-lever leg and the
  //                        full-dim truth leg are q154's two bounded
  //                        offline recall-evaluation broadcasts — the
  //                        dual audit is the query's point (r15)
  private val allowedNestedLoop: Set[String] = Set(
    "q16_recency_buckets", "q83_shard_assign", "q85_bm25", "q91_temperature_mix",
    "q48_topic_scoring", "q49_eval_metrics", "q64_gap_report",
    "q25_ann_cosine_topk", "q58_ann_ivf", "q103_salted_join",
    "q118_hybrid_rrf", "q122_semantic_decontam",
    "q131_bloom_decontam", "q132_kmv_overlap", "q133_corpus_pipeline",
    "q138_zorder_layout",
    "q141_bloom_skipping", "q147_ivf_multiprobe", "q154_random_projection",
    "q157_ivf_pq", "q158_jl_ivf",
    // q160: q157's adjudication verbatim — residual encoding changes
    // the codebook input, not the audit shape (r15)
    "q160_residual_pq",
    // q161: the three-lever stack — serving legs are list-bucketed
    // equi-joins; only the full-dim truth leg broadcasts the bounded
    // query slice (the q157 adjudication) (r15)
    "q161_jl_ivf_pq",
    // q162: q160's adjudication — the per-list-table serving leg stays
    // an equi-join on (list, code); only the truth leg broadcasts (r15)
    "q162_residual_multiprobe",
    // q164/q165/q166: the q157/q160/q162 pipelines verbatim over the
    // planted-neighbor corpus — same plan shapes, same adjudication:
    // serving legs are list-bucketed equi-joins, only the bounded
    // offline recall-audit legs broadcast the 10-row query slice (r16)
    "q164_planted_ivf_pq", "q165_planted_residual_pq",
    "q166_planted_multiprobe",
    // q167/q168/q169: q158/q161/q162's plan shapes on the planted
    // corpus — same adjudication; q169's rerank leg joins the bounded
    // ADC shortlist back to the store by id (broadcast equi-join) (r16)
    "q167_planted_jl_ivf", "q168_planted_jl_ivf_pq",
    "q169_planted_rerank",
    // q173: q85's BM25 shape on the lexicon corpus — the only
    // non-equi broadcast is the 1-row (N, avgdl) corpus-stats frame
    // (q85's standing adjudication)
    "q173_lex_bm25",
    // q175: the word-level and doc-level 1-ROW summary frames combine
    // for the output explode; Catalyst constant-folds the literal join
    // key away, so the 1×1 combine plans as a nested loop — bounded by
    // construction (both sides are single-row aggregates)
    "q175_lex_heaps",
    // q178: q133's pipeline verbatim on the lexicon corpus — the same
    // 1-row bloom-filter broadcast in front of the decontamination
    // equi-join (q133's standing adjudication)
    "q178_lex_pipeline",
    // q187: the token-currency pipeline shares q133's decontamination
    // stage (Corpus.gramDecontam — the identical 1-row bloom broadcast)
    "q187_multilex_pipeline")

  test("no declared query plans a cartesian or nested-loop join") {
    val failures = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => imperative(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.sparkPlan
        val bad = plan.collect {
          case c: CartesianProductExec => c.nodeName
          case b: BroadcastNestedLoopJoinExec => b.nodeName
        }
        if (bad.nonEmpty && !allowedNestedLoop(name)) Some(name -> bad)
        else None
      }
    assert(failures.isEmpty,
      failures.map { case (n, b) => s"$n: ${b.mkString(",")}" }.mkString("; "))
  }
}
