package graft.operators

import graft.Tables.T
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Serve._

/** Text-analysis operators over the documents table — the reference's §2.11
  * family (claims regex T1, topic/quality heuristics T2/T3/T11, token + text
  * normalisation T13) plus the training-data-pipeline mandate: language-ID,
  * quality scoring, token counting.
  *
  * Everything is codegen'd column expressions (regexp_count, higher-order
  * array functions) — no UDFs, so the whole stage stays inside
  * WholeStageCodegen and scales linearly with input splits; there is no
  * shuffle before the final aggregate/sort.
  */
object TextAnalysis {

  private val stopEn = Seq("the", "and", "of", "to", "in", "a", "is", "that", "for", "it")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no")
  private val stopFr = Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "ce")

  private def stopHits(listName: String, words: Seq[String]) =
    expr(s"size(filter(words, w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))")
      .as(listName)

  /** q29 — per-language token statistics: whitespace tokens, a BPE-ish
    * regex token count (letter runs / single digits / single symbols —
    * the shape a byte-pair pre-tokenizer produces), char totals. */
  def q29TokenStats(t: T): DataFrame =
    t.documents
      .withColumn("words", split(trim(col("text")), "\\s+"))
      .withColumn("n_words", size(col("words")))
      .withColumn("n_bpe",
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]|[^a-z0-9 ]")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        max("n_words").as("max_words"),
        sum("n_bpe").as("total_bpe"),
        sum("n_chars").as("total_chars"),
        (sum("n_words") * lit(1.0) / count(lit(1))).as("avg_words"),
        (sum("n_chars") * lit(1.0) / sum("n_words")).as("chars_per_word"))
      .smallSort("lang")

  /** q30 — stopword-overlap language ID + composite quality score
    * (length / punctuation / stopword-ratio components — the reference's
    * auto-review heuristics, study_scraper/auto_review.py:41-66, recast
    * for corpus filtering). Deterministic tie-break order en>de>es>fr. */
  def q30QualityLangid(t: T): DataFrame =
    t.documents
      .withColumn("words", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("n_words", size(col("words")))
      .select(
        col("doc_id"), col("lang"), col("n_chars"), col("n_words"),
        stopHits("s_en", stopEn), stopHits("s_de", stopDe),
        stopHits("s_es", stopEs), stopHits("s_fr", stopFr),
        // character-class count via translate-removal: strictly the chars
        // NOT in [a-z0-9 ] survive, so length(survivors) == the old
        // regexp_count(lower(text), '[^a-z0-9 ]') — without a regex scan
        length(translate(lower(col("text")),
          "abcdefghijklmnopqrstuvwxyz0123456789 ", "")).as("n_punct"))
      .withColumn("predicted_lang",
        when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")), "en")
          .when(col("s_de") >= greatest(col("s_es"), col("s_fr")), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .withColumn("stop_ratio", col("s_en") * lit(1.0) / col("n_words"))
      .withColumn("punct_ratio", col("n_punct") * lit(1.0) / col("n_chars"))
      .withColumn("quality_score",
        least(col("n_chars") / lit(400.0), lit(1.0)) * lit(0.5) +
          least(col("stop_ratio") * lit(3.0), lit(1.0)) * lit(0.3) +
          when(col("punct_ratio") < 0.05, lit(0.2)).otherwise(lit(0.0)))
      .withColumn("quality_tier",
        when(col("quality_score") >= 0.75, "high")
          .when(col("quality_score") >= 0.45, "medium")
          .otherwise("low"))
      .select("doc_id", "lang", "predicted_lang", "n_words",
        "s_en", "s_de", "s_es", "s_fr", "stop_ratio", "punct_ratio",
        "quality_score", "quality_tier")
      // materialize once before the serving sort — see Polls.q22PollTrends
      .localCheckpoint(false)
      .orderBy("doc_id")

  /** q73 — repetition quality signals (Gopher-style, Rae et al. 2021
    * §A1.1): per-document duplicate-word fraction, most-frequent-word
    * share, and most-frequent-word-bigram share, plus the keep/drop
    * decision a training-data filter would take. Thresholds (dup ≤ 0.55,
    * top-bigram ≤ 0.10) split the synthetic corpus ~50/50 so both flag
    * arms stay exercised.
    *
    * 100 TB design: every signal is computed inside the row — `split`,
    * `array_distinct`, and the native codegen'd `top_gram_count` for the
    * word and bigram frequency maxima (functions/TopGramCount.scala; the
    * earlier `array_sort` + `aggregate`-fold + `zip_with` composition
    * walked the interpreted HOF evaluator per element, ~2× the query) —
    * so the whole query is a single map-side pass with no explode, no
    * groupBy, and no shuffle before the serving sort. The oracle replays
    * the counts the classic way (unnest + GROUP BY + max) —
    * value-identical because most-common-item frequency equals
    * longest-equal-run-after-sort, and all ratios are int/int divisions
    * (exact in IEEE754, so DuckDB and Spark agree bit-for-bit). */
  def q73RepetitionSignals(t: T): DataFrame =
    repetitionSignals(t.documents)
      // row-level unbounded output: keep the distributed range sort; the
      // lazy checkpoint materializes during its sampling pass so the sort
      // job reads rows instead of re-running the per-doc folds (q30 shape)
      .localCheckpoint(false)
      .orderBy("doc_id")

  /** The reusable repetition-signal stage: (doc_id, text, …) → one row per
    * doc with the counts, fractions, and keep flag of q73. Separate from
    * the query so specs can drive it with hand-computed corpora. */
  def repetitionSignals(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(trim(col("text")), "\\s+"))
      .withColumn("n_words", size(col("words")))
      .withColumn("n_distinct", size(array_distinct(col("words"))))
      .withColumn("top_word_count", expr("top_gram_count(words, 1)"))
      .withColumn("top_bigram_count", expr("top_gram_count(words, 2)"))
      .withColumn("dup_word_frac",
        (col("n_words") - col("n_distinct")) * lit(1.0) / col("n_words"))
      .withColumn("top_word_frac",
        col("top_word_count") * lit(1.0) / col("n_words"))
      // one-word doc: 0 bigrams → count 0; clamp the denominator so the
      // fraction is 0 instead of a divide-by-zero (ANSI mode throws)
      .withColumn("top_bigram_frac",
        col("top_bigram_count") * lit(1.0) / greatest(col("n_words") - 1, lit(1)))
      .withColumn("keep",
        col("dup_word_frac") <= 0.55 && col("top_bigram_frac") <= 0.10)
      .select("doc_id", "n_words", "n_distinct", "dup_word_frac",
        "top_word_count", "top_word_frac", "top_bigram_count",
        "top_bigram_frac", "keep")

  // PII patterns shared by the extract and redact passes. Both engines'
  // regex dialects (Java here, RE2 in the DuckDB oracle) treat these
  // identically: character classes, bounded repetition, no backtracking-
  // dependent constructs, and leftmost-greedy matching agree on every
  // candidate in the built corpus.
  private val emailPat = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phonePat = "\\+[0-9]{1,3}-[0-9]{1,4}-[0-9]{3,6}"

  /** q74 — PII detection + redaction, the scrub stage of a training-data
    * pipeline (emails and phone numbers here; the pattern set extends
    * without changing the shape). Builds deterministic "support ticket"
    * text from the customer table (the q32/q53 synthesis pattern, so the
    * oracle can replay the build), counts matches per kind, and emits the
    * redacted text with `<EMAIL>`/`<PHONE>` placeholders.
    *
    * 100 TB design: pure map-side — two `regexp_extract_all` counts and
    * two global `regexp_replace` passes per row, no shuffle before the
    * serving sort; scales with input splits like q29/q30. */
  def q74PiiScrub(t: T): DataFrame =
    t.customer
      .withColumn("text",
        when(col("c_custkey") % 3 === 0, concat(
          lit("ticket from "), col("c_name"), lit(" reach me at user"),
          col("c_custkey"), lit("@mail-"), col("c_custkey") % 5,
          lit(".example.com thanks")))
          .when(col("c_custkey") % 3 === 1, concat(
            lit("call "), col("c_name"), lit(" on +49-30-"),
            lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
            when(col("c_custkey") % 7 === 1,
              concat(lit(" or "), lower(col("c_mktsegment")),
                lit(".desk@support.example.org"))).otherwise(lit("")),
            lit(" after hours")))
          .otherwise(concat(
            lit("no contact info for segment "), col("c_mktsegment"))))
      .transform(piiSignals)
      .select(col("c_custkey").as("cust_id"), col("n_emails"),
        col("n_phones"), col("has_pii"), col("redacted"))
      .localCheckpoint(false)
      .orderBy("cust_id")

  /** The reusable scrub stage: appends n_emails / n_phones / has_pii /
    * redacted to any frame with a `text` column. Separate from the query
    * so specs can drive it with hand-written texts. */
  def piiSignals(df: DataFrame): DataFrame =
    df
      // group 0 = the whole match: Spark's 2-arg regexp_extract_all
      // defaults to group 1, which errors on these group-free patterns
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col("text"), lit(phonePat), lit(0))))
      .withColumn("has_pii", col("n_emails") + col("n_phones") > 0)
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
          phonePat, "<PHONE>"))

  /** q32 — claim extraction with German numerics (T1,
    * study_scraper/claims.py:57-251): builds claim sentences from the
    * orders table (integer parts only, so the oracle recomputes expected
    * values independently of the regex path), then extracts percent values
    * (`62,5 %` / `62,5 Prozent` German decimal comma) and sample sizes with
    * German thousands dots (`n = 6.063` → 6063), with the >120% suppression
    * rule (claims.py:173-176). Docs with no number yield no claims. */
  def q32ClaimsGerman(t: T): DataFrame = {
    val built = t.orders
      .withColumn("pct_int", col("o_orderkey") % 150)
      .withColumn("pct_dec", col("o_custkey") % 10)
      .withColumn("n_val", lit(1000) + col("o_orderkey") % 9000)
      .withColumn("n_fmt",
        concat(expr("n_val div 1000"), lit("."),
          lpad((col("n_val") % 1000).cast("string"), 3, "0")))
      .withColumn("unit_word",
        when(col("o_orderkey") % 2 === 0, " %").otherwise(" Prozent"))
      .withColumn("sentence",
        when(col("o_orderkey") % 7 === 0, lit("Studie ohne Zahlen."))
          .otherwise(concat(
            lit("Studie S"), col("o_orderkey"), lit(": Zustimmung bei "),
            col("pct_int"), lit(","), col("pct_dec"), col("unit_word"),
            lit(" (n = "), col("n_fmt"), lit(")."),
            when(col("o_orderkey") % 3 === 0,
              concat(lit(" Ablehnung bei "), col("pct_int") % 50, lit(","),
                col("pct_dec"), col("unit_word"), lit(".")))
              .otherwise(lit("")))))
    // Total (poll_id, claim_idx) order WITHOUT a final global sort: a
    // trailing orderBy range-samples its input, re-running the regex
    // pipeline twice (measured ~2x the whole query). Range-partition +
    // sort the CHEAP synthesized sentences instead — everything after is
    // narrow and order-preserving (posexplode emits claim_idx in array
    // order), so partition-concatenation order IS (poll_id, claim_idx).
    //
    // The sentence corpus is MATERIALIZED once per (session, sf dir) —
    // the q21-q23/q38 staging-table pattern (Polls.stgPollResultsTable):
    // the synthesis here stands in for a stored ticket/document table the
    // reference reads from disk (claims.py consumes persisted studies),
    // so landing it as an eager range-clustered localCheckpoint is the
    // warehouse shape, and every claim-extraction pass reads decoded rows
    // instead of re-running synthesis + the range sampler's second pass
    // over it (r9 ask: that staging was the measured q32 cost, not the
    // claim_pcts scan).
    extractClaims(claimCorpusCache.computeIfAbsent((t.spark, t.sfDir), { _ =>
      graft.SessionCaches.arm(t.spark)
      built.select(col("o_orderkey").as("poll_id"), col("sentence"))
        .repartitionByRange(t.spark.sparkContext.defaultParallelism, col("poll_id"))
        .sortWithinPartitions("poll_id")
        .localCheckpoint()
    }))
  }
  private val claimCorpusCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()
  graft.SessionCaches.onStop(s => claimCorpusCache.keySet.removeIf(_._1 eq s): Unit)
  graft.SessionCaches.registerHolder(s => claimCorpusCache.keySet.stream().anyMatch(_._1 eq s))

  /** The reusable claim extractor (T1): input (poll_id, sentence) → one row
    * per extracted percent claim with its sample size. German decimal
    * commas (`62,5` → 62.5), thousands dots in n (`6.063` → 6063),
    * `%`/`Prozent` unit alternation, >120 suppression, claim_idx in
    * extraction order (suppressed claims keep their gap). */
  def extractClaims(df: DataFrame): DataFrame = {
    // No literal pre-filter: on a claim-dense corpus (6 of 7 synthetic
    // sentences carry a unit) the extra digit/unit scans cost more than
    // the rows they prune — the scan alone is exact (empty match array →
    // no posexplode rows).
    df
      // ONE native byte-level scan per sentence (functions/ClaimPcts
      // .scala): no regex engine, no match-string materialization, no
      // per-match split arrays. Value-identical to the
      // regexp_extract_all + transform/split composition the oracle
      // replays (equivalence argued in the expression's scaladoc; pinned
      // by ClaimsSpec and a random-sentence property test). The r5 shape
      // scanned every sentence twice with the full pattern; the r7 shape
      // once plus per-match splits; this is one scan, period.
      .withColumn("ms", expr("claim_pcts(sentence)"))
      .withColumn("n_raw", regexp_extract(col("sentence"), "n\\s*=\\s*([0-9.]+)", 1))
      .select(
        col("poll_id"),
        posexplode(col("ms")).as(Seq("claim_idx", "claim_value")),
        when(col("n_raw") =!= "",
          replace(col("n_raw"), lit("."), lit("")).cast("int")).as("sample_n"))
      .filter(col("claim_value") <= 120.0) // >120% suppression
  }

  /** q100 — model-based quality filtering: linear-classifier INFERENCE
    * over hashed bag-of-words features, the fastText/CCNet stage of a
    * training-data pipeline (classify every document with an externally
    * trained quality model, keep the positives; complements q30's
    * heuristic score). The model is a 1024-bucket weight vector riding
    * the plan as ONE array literal — exactly how learned weights deploy
    * at 100 TB (a broadcast-sized array in the closure, never a join):
    * each token hashes to a bucket (the portable 60-bit md5 family of
    * q42/q84), `element_at` looks up its weight, and the document logit
    * is the HOF weight sum — pure map-side, zero shuffle, codegen'd.
    * Weights here are synthesized from the bucket id by a fixed affine
    * map (all-integer, range [-500, 500]) so the oracle recomputes both
    * the hash and the weights exactly; swapping in trained weights
    * changes one Array, nothing in the plan.
    */
  def q100QualityClf(t: T): DataFrame = qualityClf(t.documents)

  /** The synthesized 1024-bucket weight vector (public for the spec's
    * brute-force recompute). */
  val clfWeights: Array[Long] =
    Array.tabulate(1024)(b => (b.toLong * 2654435761L) % 1001L - 500L)

  /** Classifier core over any (doc_id, text) frame. */
  def qualityClf(docs: DataFrame): DataFrame = {
    val weights = lit(clfWeights)
    val toks = filter(split(trim(lower(col("text"))), "\\s+"), _ =!= "")
    val bucket = (tkn: Column) =>
      (conv(substring(md5(concat(lit("100:"), tkn)), 1, 15), 16, 10)
        .cast("long") % 1024L).cast("int")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        aggregate(col("toks"), lit(0L),
          (acc, tkn) => acc + element_at(weights, bucket(tkn) + 1))
          .as("logit"))
      .withColumn("keep", col("logit") > 0L)
      .orderBy("doc_id")
  }

  /** q125 — per-language vocabulary heavy hitters via the native
    * SpaceSaving sketch (`functions/HeavyHitters.scala`): ONE pass, at
    * most k counters per group, partial sketches merged across
    * partitions like any sum. This is the 100 TB "top tokens / domains /
    * users per stratum" shape — an exact count would shuffle the full
    * key universe; the sketch ships k-entry buffers. On this corpus the
    * per-language vocabulary is under k, so the sketch is provably EXACT
    * (err = 0) and the oracle replays it as plain counts; the
    * approximation-mode guarantees are pinned by HeavyHittersSpec on
    * adversarial streams. */
  def q125HeavyHitters(t: T): DataFrame =
    t.documents
      .select(col("lang"), explode(TextDedup.tokens(col("text"))).as("w"))
      .groupBy("lang")
      .agg(expr("heavy_hitters(w, 64)").as("hh"))
      .select(col("lang"), posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("e.item").as("item"), col("e.count").as("cnt"),
        col("e.err").as("err"))
      .orderBy("lang", "rank")

  /** q126 — per-language top-3 longest documents via the native bounded-
    * heap `topk` aggregate (`functions/TopK.scala`, Max2 generalized):
    * grouped top-k WITHOUT a per-group window sort. The window form
    * (`row_number() <= 3` over partitionBy(lang)) funnels every group's
    * full row set through per-group sort partitions — the skew cliff at
    * 100 TB when one language holds most of the corpus; the k-slot heap
    * partial-aggregates map-side like any max, each partition shipping
    * at most k struct values per group. The (n_chars, doc_id) struct
    * makes the order total, so the result is the exact deterministic
    * top-3 and the oracle replays it as a plain window rank. */
  def q126TopkPerGroup(t: T): DataFrame =
    t.documents
      .groupBy("lang")
      .agg(expr("topk(struct(n_chars, doc_id), 3)").as("tk"))
      .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("e.doc_id").as("doc_id"), col("e.n_chars").as("n_chars"))
      .orderBy("lang", "rank")

  /** Gopher-rule stopwords (Rae et al. 2021 table A1 — the "contains at
    * least 2 of" list). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** q121 — the Gopher quality-rule battery (Rae et al. 2021, §A1.1):
    * the canonical per-document heuristic filter a web corpus passes
    * through before model-based scoring. Each rule surfaces as its own
    * boolean next to the measured quantity (a curation pipeline tunes
    * and audits rules individually — a single opaque keep bit is not
    * reviewable), with keep = the conjunction:
    *
    *  - r_wc:    50 ≤ word count ≤ 100 000
    *  - r_mwl:   3 ≤ mean word length ≤ 10
    *  - r_sym:   (words containing '#' or '...') / words ≤ 0.1
    *  - r_alpha: ≥ 80 % of words contain an alphabetic character
    *  - r_stop:  ≥ 2 distinct Gopher stopwords present
    *
    * 100 TB shape: every rule is a per-row higher-order array function —
    * zero shuffle, whole-stage codegen, linear in input splits; ratios
    * are int/int IEEE divisions, exact in both engines. */
  def q121GopherRules(t: T): DataFrame =
    gopherRules(t.documents).orderBy("doc_id")

  /** The rule core over any (doc_id, text) frame — public for the spec's
    * hand corpus and parameterized on the stop list (q121 uses the Gopher
    * English function words; q177 re-grounds the rule in the lexicon
    * corpus's own frequent words). Unsorted — callers add their serving
    * sort or aggregate on top. */
  def gopherRules(documents: DataFrame,
                  stops: Seq[String] = GopherStops,
                  stopsByLang: Option[Map[String, Seq[String]]] = None)
  : DataFrame = {
    val words = TextDedup.tokens(col("text"))
    // q187: the stop count keyed by the document's OWN language — a
    // fold of `when`s over the per-language literal lists, still ONE
    // map-side pass (no second projection, no self-join)
    val nStop = stopsByLang match {
      case Some(byLang) => byLang.toSeq.sortBy(_._1).foldLeft(lit(0)) {
        case (acc, (l, s)) => when(col("lang") === l,
          size(array_intersect(col("w"), array(s.map(lit): _*))))
          .otherwise(acc)
      }
      case None => size(array_intersect(col("w"), array(stops.map(lit): _*)))
    }
    documents
      .select(col("doc_id") +: (if (stopsByLang.isDefined)
        Seq(col("lang")) else Seq.empty) :+ words.as("w"): _*)
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        aggregate(col("w"), lit(0L), (acc, x) => acc + length(x)).as("n_chars_w"),
        size(filter(col("w"), x => x.rlike("[a-z]"))).as("n_alpha"),
        size(filter(col("w"),
          x => x.contains("#") || x.contains("..."))).as("n_sym"),
        nStop.as("n_stop_distinct"))
      .withColumn("mean_word_len",
        when(col("n_words") > 0,
          col("n_chars_w") * lit(1.0) / col("n_words")).otherwise(lit(0.0)))
      .withColumn("alpha_frac",
        when(col("n_words") > 0,
          col("n_alpha") * lit(1.0) / col("n_words")).otherwise(lit(0.0)))
      .withColumn("sym_frac",
        when(col("n_words") > 0,
          col("n_sym") * lit(1.0) / col("n_words")).otherwise(lit(0.0)))
      .withColumn("r_wc", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_mwl", col("mean_word_len") >= 3 && col("mean_word_len") <= 10)
      .withColumn("r_sym", col("sym_frac") <= 0.1)
      .withColumn("r_alpha", col("alpha_frac") >= 0.8)
      .withColumn("r_stop", col("n_stop_distinct") >= 2)
      .withColumn("keep",
        col("r_wc") && col("r_mwl") && col("r_sym") && col("r_alpha") && col("r_stop"))
      .select("doc_id", "n_words", "mean_word_len", "alpha_frac", "sym_frac",
        "n_stop_distinct", "r_wc", "r_mwl", "r_sym", "r_alpha", "r_stop", "keep")
  }

  /** DSIR feature-hash bucket count (q119). */
  val DsirBuckets = 256
  /** DSIR resample target size (q119). */
  val DsirKeep = 100

  /** q119 — DSIR importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): select raw-pool
    * documents whose hashed-n-gram distribution looks like a TARGET
    * domain (here lang = 'en', standing in for the curated target set).
    *
    *  1. Features: word unigrams + bigrams hashed into [[DsirBuckets]]
    *     buckets (the portable 60-bit md5 family, seed 119).
    *  2. Per-bucket add-1-smoothed log-likelihood ratio between the
    *     target and raw gram distributions.
    *  3. Per-doc importance weight logw = Σ_buckets n_b · lr_b.
    *  4. Gumbel-top-k resampling WITHOUT replacement: key =
    *     logw + Gumbel(h), with the Gumbel drawn from the replayable
    *     doc-id hash (q51/q75 device) — deterministic, so the oracle and
    *     any rerun pick identical survivors.
    *
    * 100 TB shape: the gram stream collapses map-side to (doc, bucket)
    * counts (partial aggregation — the exchange carries bucket-count
    * rows, never gram occurrences); the LR model is a [[DsirBuckets]]-row
    * broadcast artifact (this IS how the fitted importance estimator
    * ships to a fleet — model-as-plan-literal, the q100 pattern, except
    * learned from data in the same job); scoring is one map-side join +
    * per-doc aggregate; the top-k is a TakeOrdered on the rounded key,
    * never a global sort. Doubles are rounded to 4 dp before any
    * ordering (the q85 ln() treatment) so the cut is engine-stable. */
  def q119DsirResample(t: T): DataFrame = dsirResample(t.documents)

  /** The DSIR core over any (doc_id, text, lang) frame — public so specs
    * drive hand-built pools through the identical pipeline. */
  def dsirResample(documents: DataFrame, targetLang: String = "en",
                   keep: Int = DsirKeep): DataFrame = {
    val words = TextDedup.tokens(col("text"))
    // unigrams ++ word-bigrams ("a b") — bigram leg guarded so 0/1-word
    // docs contribute unigrams only
    val bigrams = when(size(col("w")) >= 2,
      zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    // ONE corpus shuffle (the q76 shape): the gram stream collapses
    // map-side to (doc, bucket, n) rows — partial aggregation combines
    // before the exchange — and BOTH later stages derive from that
    // aggregate: the histograms are a tiny re-aggregate of it, and the
    // scoring join broadcasts the bucket model back onto the same rows.
    // lang rides in the key (constant per doc, so it splits nothing).
    val db = documents
      .select(col("doc_id"), col("lang"), words.as("w"))
      .select(col("doc_id"), col("lang"),
        explode(concat(col("w"), bigrams)).as("g"))
      .withColumn("bucket",
        expr(s"${TextDedup.h60(119, "g")} % $DsirBuckets"))
      .groupBy("doc_id", "lang", "bucket")
      .agg(count(lit(1)).as("n"))
      // feeds the LR fit AND the scoring join — the 2-consumer
      // localCheckpoint treatment (q76/q85), on the collapsed aggregate,
      // never the gram stream
      .localCheckpoint(false)
    // fit: raw + target bucket histograms in ONE pass; the gram totals
    // come from a whole-frame window over the histogram — the frame is
    // [[DsirBuckets]] rows BY CONSTRUCTION (the q83 post-aggregate-small
    // device), so the single-partition window is free and the model
    // needs no extra broadcast-job round-trip
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val hist = db.groupBy("bucket").agg(
      sum("n").cast("double").as("raw_n"),
      sum(when(col("lang") === targetLang, col("n")).otherwise(0L))
        .cast("double").as("tgt_n"))
    val lrModel = hist
      .withColumn("raw_t", sum("raw_n").over(wAll))
      .withColumn("tgt_t", sum("tgt_n").over(wAll))
      .select(col("bucket"),
        (log((col("tgt_n") + 1) / (col("tgt_t") + DsirBuckets)) -
          log((col("raw_n") + 1) / (col("raw_t") + DsirBuckets))).as("lr"))
    // apply: the same (doc, bucket, n) rows → broadcast model join → logw
    val scored = db
      .join(broadcast(lrModel), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_grams"),
        round(sum(col("n") * col("lr")), 4).as("logw"))
    // Gumbel-top-k: u ∈ (0,1) from the replayable hash, key = logw + g
    val u = (expr(s"${TextDedup.h60(1190, "CAST(doc_id AS STRING)")} % 1000000")
      + lit(0.5)) / lit(1000000.0)
    scored
      .withColumn("gkey", round(col("logw") + -log(-log(u)), 4))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(keep)
      .withColumn("pick",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("gkey").desc, col("doc_id"))))
      .select("doc_id", "n_grams", "logw", "gkey", "pick")
  }

  /** q128 — CCNet-style perplexity quality filter (Wenzek et al., LREC
    * 2020: score crawl text with an LM trained on a clean corpus, bucket
    * into head/middle/tail): a stupid-backoff bigram LM (Brants et al.,
    * EMNLP 2007 — `p(w2|w1) = c(w1,w2)/c(w1·)` when the bigram was seen,
    * else `0.4 · (c(w2)+1)/(N+V)` add-one unigram backoff) trained on the
    * EVEN doc_ids and scoring the ODD ones. Lifts the reference's static
    * quality heuristics (study_scraper/auto_review.py:41-66) to a learned
    * model, the same shape as q100's classifier but with a 2-gram LM.
    *
    * FP-safety contract: each bigram's −ln p is rounded to integer
    * MICRO-NATS before the per-document sum, so the summed `nll_micro`
    * is exact integer arithmetic — order- and partition-independent —
    * and the only cross-engine float ops are one ln and one exp of
    * deterministic operands (the q85/q107 rounding precedent covers the
    * final 4-dp perplexity). 100 TB shape: the bigram explode is
    * map-side; the LM build is ONE corpus shuffle on (lang, w1, w2) plus
    * a vocabulary-sized context aggregate; scoring is hash joins keyed
    * by bigram/unigram (AQE broadcasts the LM when it is small) and a
    * per-doc aggregate. At real scale the LM would be count-pruned
    * (drop hapax bigrams) — same plan, smaller build side. */
  def q128Perplexity(t: T): DataFrame = perplexityFilter(t.documents)

  def perplexityFilter(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), col("lang"), TextDedup.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bi = docs.select(col("doc_id"), col("lang"),
        explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val trainBi = bi.filter(col("doc_id") % 2 === 0)
    // collapsed bigram counts feed ctx AND the probability join — the
    // 2-consumer localCheckpoint treatment (q76/q85), on the aggregate,
    // never the raw bigram stream
    val lm2 = trainBi.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    val ctx = lm2.groupBy("lang", "w1").agg(sum("c2").as("cctx"))
    val lm = lm2.join(ctx, Seq("lang", "w1"))
      .select(col("lang"), col("w1"), col("w2"),
        (col("c2").cast("double") / col("cctx").cast("double")).as("p2"))
    val uni = docs.filter(col("doc_id") % 2 === 0)
      .select(col("lang"), explode(col("ws")).as("w2"))
      .groupBy("lang", "w2").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false)
    val stats = uni.groupBy("lang")
      .agg(sum("c1").as("big_n"), count(lit(1)).as("vocab"))
    bi.filter(col("doc_id") % 2 =!= 0)
      .join(lm, Seq("lang", "w1", "w2"), "left")
      .join(uni, Seq("lang", "w2"), "left")
      .join(broadcast(stats), Seq("lang"))
      .withColumn("p", when(col("p2").isNotNull, col("p2"))
        .otherwise(lit(0.4) * (coalesce(col("c1"), lit(0L)).cast("double") + lit(1.0)) /
          (col("big_n").cast("double") + col("vocab").cast("double"))))
      .withColumn("nllu", round(-log(col("p")) * lit(1000000.0), 0).cast("long"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("p2").isNull, 1L).otherwise(0L)).as("n_backoff"),
        sum("nllu").as("nll_micro"))
      .withColumn("ppl", round(
        exp(col("nll_micro").cast("double") / lit(1000000.0) /
          col("n_bigrams").cast("double")), 4))
      .withColumn("ppl_bucket",
        when(col("ppl") < 32.0, "head")
          .when(col("ppl") < 36.0, "middle").otherwise("tail"))
      .select("doc_id", "lang", "n_bigrams", "n_backoff", "nll_micro", "ppl",
        "ppl_bucket")
      .orderBy("doc_id")
  }

  /** q129 — per-language distinct word-3-shingle cardinality (the q27
    * shingle universe — thousands of keys per language, where the raw
    * 31-word synthetic vocabulary would be degenerate) via the native
    * deterministic HyperLogLog sketch (`functions/HllDistinct.scala`):
    * 512-byte register buffers partial-aggregate map-side and merge by
    * pointwise max — the 100 TB "distinct per stratum" shape, where the
    * exact `count(DISTINCT)` beside it (the verification column, and the
    * cost this sketch deletes at scale) shuffles the full key universe.
    * The estimator formula lives HERE in the query over the sketch's
    * exact-integer register summary — one double division of exact
    * integers (`z_scaled` is Σ2^(52−M_j) pre-scaled to an exact BIGINT),
    * so the oracle replays estimate and registers bit-for-bit. */
  def q129HllDistinct(t: T): DataFrame = {
    val toks = t.documents
      .select(col("lang"), TextDedup.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(ws) - 3), " +
          "i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))")).as("w"))
    toks.groupBy("lang")
      .agg(expr("hll_distinct(w)").as("h"), countDistinct(col("w")).as("exact"))
      .select(col("lang"), lit(512).as("m"),
        col("h.n_zero").as("n_zero"), col("h.sum_rho").as("sum_rho"),
        col("h.reg_fp").as("reg_fp"), col("h.z_scaled").as("z_scaled"),
        col("exact"))
      .withColumn("est", HllEstimate.estimate(col("n_zero"), col("z_scaled")))
      .withColumn("ok", HllEstimate.okBound(col("est"), col("exact")))
      .select("lang", "m", "n_zero", "sum_rho", "reg_fp", "z_scaled", "est",
        "exact", "ok")
      .orderBy("lang")
  }

  /** q130 — point-frequency estimates for each language's top-20 word
    * BIGRAMS (~900 distinct keys per language against 256 buckets, so
    * collisions — and the min-over-rows estimate they exercise — are
    * real) via the native Count–Min sketch (`functions/CmsSketch.scala`): the
    * 8 KiB matrix partial-aggregates map-side and merges by pointwise
    * sum, then the probe side broadcast-joins it and reads 4 cells per
    * item — answering "how often does THIS key occur" without shuffling
    * the key universe (the exact `cnt` beside it is the verification
    * column and the deleted cost). The probe set is the true top-20 per
    * language through the bounded-heap `topk` aggregate (q126's shape —
    * no per-group window sort), `matrix_fp` pins all 1024 cells, and
    * `overcount = est − true ≥ 0` pins the CMS one-sided guarantee row
    * by row. */
  def q130CmsFreq(t: T): DataFrame = {
    val toks = t.documents
      .select(col("lang"), TextDedup.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> concat_ws(' ', ws[i], ws[i + 1]))")).as("w"))
    val top = toks.groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      .groupBy("lang").agg(expr("topk(struct(cnt, w), 20)").as("tk"))
      .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("e.w").as("w"), col("e.cnt").as("true_cnt"))
    val mat = toks.groupBy("lang").agg(expr("cms_sketch(w)").as("cm"))
      .withColumn("matrix_fp", expr(
        "aggregate(zip_with(cm, sequence(1, 1024), (c, i) -> c * i), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
    val ests = (0 until 4).map { r =>
      expr(s"element_at(cm, CAST($r * 256 + " +
        s"${TextDedup.h60(130, s"concat('$r:', w)")} % 256 + 1 AS INT))")
    }
    top.join(broadcast(mat), Seq("lang"))
      .withColumn("est_cnt", least(ests: _*))
      .withColumn("overcount", col("est_cnt") - col("true_cnt"))
      .select("lang", "rank", "w", "true_cnt", "est_cnt", "overcount",
        "matrix_fp")
      .orderBy("lang", "rank")
  }

  /** q136 — the per-source CORPUS PROFILE: the one-pass report a
    * pipeline runs on every new crawl slice before admitting it, with
    * every unbounded-state statistic served by a bounded sketch —
    * distinct-bigram vocabulary via `hll_distinct` (the exact
    * `count(DISTINCT)` beside it is the verification column and the
    * deleted cost), dominant tokens via the SpaceSaving
    * `heavy_hitters` (EXACT here — per-source vocabulary ≤ k = 64, so
    * err = 0 and the oracle replays it as plain ranked counts), plus
    * the small exact aggregates (docs, tokens, chars, languages). One
    * shuffle on the group key carries only fixed-size buffers; at
    * 100 TB this is the profile job's entire memory story. Extends
    * the reference's per-source status tallies
    * (study_scraper/status.py:80-222) with cardinality/frequency
    * columns an exact plan could not afford at scale. */
  def q136CorpusProfile(t: T): DataFrame = corpusProfile(t.documents)

  def corpusProfile(documents: DataFrame): DataFrame = {
    val base = documents.select(col("source"), col("lang"), col("n_chars"),
      TextDedup.tokens(col("text")).as("ws"))
    val docStats = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum(expr("size(ws)")).as("n_tokens"),
      sum("n_chars").as("n_chars_total"))
    // try_element_at, not getItem: under ANSI every OOB array access
    // throws (AnsiOobSpec pins this), so a source with fewer than two
    // distinct tokens would CRASH here while the DuckDB oracle's list
    // indexing yields NULL — try_element_at restores the NULL-on-short
    // semantics both engines then share (the r14-advice divergence
    // class; unreachable on the shipped corpus, pinned for the general
    // operator)
    val topTok = base.select(col("source"), explode(col("ws")).as("w"))
      .groupBy("source").agg(expr("heavy_hitters(w, 64)").as("hh"))
      .select(col("source"),
        expr("try_element_at(hh, 1).item").as("top_token"),
        expr("try_element_at(hh, 1).count").as("top_token_cnt"),
        expr("try_element_at(hh, 2).item").as("second_token"))
    val ndv = base.filter(size(col("ws")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> concat_ws(' ', ws[i], ws[i + 1]))")).as("b"))
      .groupBy("source").agg(
        expr("hll_distinct(b)").as("h"), countDistinct(col("b")).as("ndv_exact"))
    docStats.join(topTok, Seq("source")).join(ndv, Seq("source"))
      .withColumn("ndv_est",
        HllEstimate.estimate(col("h.n_zero"), col("h.z_scaled")))
      .withColumn("ok_ndv", HllEstimate.okBound(col("ndv_est"), col("ndv_exact")))
      .select("source", "n_docs", "n_langs", "n_tokens", "n_chars_total",
        "top_token", "top_token_cnt", "second_token", "ndv_est", "ndv_exact",
        "ok_ndv")
      .orderBy("source")
  }

  /** q132 — cross-stratum distinct-set OVERLAP via the native KMV
    * (bottom-k) sketch (`functions/KmvSketch.scala`): per-language
    * word-3-shingle vocabularies collapse to 256 retained hash values,
    * and every language PAIR's union/intersection/Jaccard is estimated
    * from sketch set-operations alone — the "how much of stratum B is
    * already in stratum A" question (cross-snapshot crawl overlap,
    * cross-source contamination) that HLL registers cannot answer. The
    * exact pair join beside it is the verification column and the
    * deleted cost: at 100 TB only 2 KiB sketches meet, never the raw
    * key universes. Estimators (mirrored by the oracle, from
    * exact-integer state): θ = max of the union's bottom-k,
    * `est_union = 255·2^60/θ`, `est_inter = (|A∩B| ∩ bottom-k(A∪B))
    * / 256 · est_union`; both exact when the union has < 256 distinct
    * values. Accuracy pins are SEPARATE because the two estimators have
    * different error scales: `ok_union` within ±25%% (σ ≈ 1/√(k−1) ≈
    * 6%% → ~4σ), `ok_inter` within ±75%% (relative σ ≈ 1/√(J·k) ≈ 24%%
    * at the observed J ≈ 0.07 → ~3σ; a tighter bound at this J would
    * flicker — the honest statement of what k = 256 buys on a
    * low-Jaccard pair). The 10-row sketch-pair join is a
    * tiny-by-construction broadcast (allowlisted, q131's pattern). */
  def q132KmvOverlap(t: T): DataFrame = {
    val sh = t.documents
      .select(col("lang"), TextDedup.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("lang"), explode(expr(
        s"transform(sequence(0, size(ws) - 3), i -> ${TextDedup.h60(132,
          "concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])")})")).as("h"))
    // the exact side (verification columns): distinct shingle hashes
    val d = sh.distinct().localCheckpoint(false)
    val sk = sh.groupBy("lang").agg(expr("kmv_sketch(h, 256)").as("kmv"))
    val exactN = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val exactInter = d.as("a").join(d.as("b"),
        col("a.h") === col("b.h") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val estU = expr("CASE WHEN size(u) < 256 THEN CAST(size(u) AS DOUBLE) " +
      "ELSE 255.0 * 1152921504606846976.0 / CAST(theta AS DOUBLE) END")
    val estI = expr("CASE WHEN size(u) < 256 THEN CAST(inter_in_u AS DOUBLE) " +
      "ELSE CAST(inter_in_u AS DOUBLE) / 256.0 * " +
      "(255.0 * 1152921504606846976.0 / CAST(theta AS DOUBLE)) END")
    sk.as("a").join(sk.as("b"), col("a.lang") < col("b.lang"))
      .select(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
        col("a.kmv").as("ka"), col("b.kmv").as("kb"))
      .withColumn("u", expr("slice(array_sort(array_union(ka, kb)), 1, 256)"))
      .withColumn("theta", expr("element_at(u, size(u))"))
      .withColumn("inter_in_u",
        expr("size(array_intersect(u, array_intersect(ka, kb)))"))
      .withColumn("est_union", round(estU, 4))
      .withColumn("est_inter", round(estI, 4))
      .join(exactInter, Seq("lang_a", "lang_b"))
      .join(exactN.withColumnRenamed("lang", "lang_a")
        .withColumnRenamed("n", "na"), Seq("lang_a"))
      .join(exactN.withColumnRenamed("lang", "lang_b")
        .withColumnRenamed("n", "nb"), Seq("lang_b"))
      .withColumn("exact_union", col("na") + col("nb") - col("exact_inter"))
      .withColumn("ok_union",
        abs(col("est_union") / col("exact_union").cast("double") - lit(1.0)) <= lit(0.25))
      .withColumn("ok_inter",
        abs(col("est_inter") / col("exact_inter").cast("double") - lit(1.0)) <= lit(0.75))
      .select("lang_a", "lang_b", "theta", "inter_in_u", "est_union",
        "est_inter", "exact_union", "exact_inter", "ok_union", "ok_inter")
      .orderBy("lang_a", "lang_b")
  }
}
