package graft.operators

import graft.Tables.T
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family over the documents table — the training-data-
  * pipeline mandate (exact, MinHash+LSH banded, SimHash) plus the
  * reference's content-hash change detection (D6,
  * study_scraper/models.py:22-26, ingest.py:11-14).
  *
  * Design rules for 100 TB:
  *  - NEVER all-pairs: candidate generation is always an equi-join on a
  *    band/bucket key (`groupBy`-able, shuffle-partitionable); the exact
  *    similarity check runs only on band-collision pairs.
  *  - All hashes are engine-portable column expressions: a 60-bit integer
  *    from the md5 hex prefix (conv base16→10). Not a cryptographic choice —
  *    a deterministic one: DuckDB computes the identical value, so the
  *    oracle can replay the whole LSH pipeline.
  *  - Shingling/token ops are higher-order array functions (codegen), no
  *    UDFs anywhere.
  */
object TextDedup {

  /** 60-bit portable hash of a string expression, seeded. */
  def h60(seed: Int, e: String): String =
    s"CAST(conv(substring(md5(concat('$seed:', $e)), 1, 15), 16, 10) AS BIGINT)"

  /** The corpus word tokenizer (q119/q120/q121/q125 share it, and every
    * oracle replays it as `list_filter(regexp_split_to_array(lower(trim
    * (text)), '\s+'), x -> x <> '')`): whitespace tokens of the folded
    * text, empties dropped. One definition so a tokenizer tweak cannot
    * drift across operators and their oracle SQL independently. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), _ =!= "")

  /** Affine minhash permutation coefficients (fixed primes; the oracle SQL
    * carries the same table). */
  val MinhashA: Seq[Int] = Seq(257, 643, 1031, 1543, 2053, 3079,
    4099, 6151, 8209, 12289, 16411, 24593)
  val MinhashB: Seq[Int] = Seq(911, 1213, 1713, 2389, 3391, 4441,
    5881, 7121, 9973, 11939, 14009, 17327)

  /** q24 — exact dedup with a simulated re-crawl batch: every doc_id % 5 == 0
    * arrives a second time; content-identical rows collapse onto the
    * earliest doc_id (ReplacingMergeTree "first wins" flavor), carrying a
    * duplicate count. */
  def q24DocDedupExact(t: T): DataFrame = {
    val recrawl = t.documents.filter(col("doc_id") % 5 === 0)
    t.documents.unionByName(recrawl)
      .withColumn("content_hash", sha2(col("text"), 256))
      .groupBy("content_hash")
      .agg(
        min("doc_id").as("doc_id"),
        count(lit(1)).as("dup_count"),
        max("n_chars").as("n_chars"))
      .select("doc_id", "content_hash", "dup_count", "n_chars")
      .orderBy("doc_id")
  }

  /** q27 — MinHash + banded LSH near-duplicate pairs: 12 min-hashes over
    * word-3-shingles, 4 bands × 3 rows; pairs colliding on any band are
    * verified with exact Jaccard ≥ 0.8. The reference's trigram dedup
    * (migrations/0006_title_dedup.sql:51-72) does this with pg_trgm + GIN;
    * the banded equi-join is the Spark-scale equivalent. */
  def q27MinhashNearDup(t: T): DataFrame = {
    // ONE codegen'd pass per document builds the signature
    // (functions/MinhashSigs.scala): distinct word-3-shingles, md5-based
    // base hash, 12 affine-permutation mins — the corpus-wide
    // (doc, shingle) stream of the r10 shape (explode → distinct shuffle
    // → md5 column → 12-min hash aggregate, ~1.5 M rows materialized
    // through a localCheckpoint) never exists. NULL signature = fewer
    // than 3 words = no shingles, filtered exactly like the old
    // `size(words) >= 3` pre-filter. Arithmetic replays bit-identically
    // in the oracle (products < 2^46, no overflow).
    val sigs = t.documents
      .select(col("doc_id"), col("text"), expr("minhash12(text)").as("sig"))
      .filter(col("sig").isNotNull)
      // feeds the band explode AND the verify's two text joins; the
      // checkpoint stores one signature + text row per doc (docs-sized,
      // not shingle-sized like the r10 intermediate)
      .localCheckpoint(false)
    val bands = sigs.select(
      col("doc_id"),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("band"),
        concat_ws(",", col("sig.mh")(3 * b), col("sig.mh")(3 * b + 1),
          col("sig.mh")(3 * b + 2)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Exact verify PER PAIR (functions/ShingleJaccard.scala): both texts
    // ride in via two doc_id equi-joins (candidate count × text width —
    // candidates are band-collision survivors, orders of magnitude fewer
    // than the shingle-stream rows the r10 counting joins shuffled), and
    // the codegen'd set intersection computes the IDENTICAL
    // |A∩B| / (|A|+|B|−|A∩B|) double the counting-join form produced —
    // same distinct sets, same division (spec-pinned).
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), Seq("doc_b"))
      .withColumn("jaccard", expr("shingle_jaccard(text_a, text_b)"))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** q28 — 60-bit SimHash per document plus near-dup pairs found by
    * 4×15-bit chunk banding (a pair within Hamming distance 3 of a 60-bit
    * signature collides on ≥1 of 4 chunks — pigeonhole), verified with
    * bit_count(xor) ≤ 3. */
  def q28Simhash(t: T): DataFrame = {
    // ONE codegen'd pass per document (functions/MinhashSigs.scala
    // SimHash60): token histogram → one md5 per DISTINCT token → 60
    // ±count bit sums → signature. The r10 shape exploded every token
    // occurrence and ran a 61-column hash aggregate over the stream;
    // value-identical by construction ((h div 2^b) % 2 == (h >>> b) & 1
    // for the non-negative 60-bit hash, integer sums order-exact) —
    // SimHash60 parity is pinned in MinhashSigsSpec.
    val sim = t.documents
      .select(col("doc_id"), expr("simhash60(text)").as("simhash"))
      // One signature row per document — materialize before the chunk
      // explode so the banding self-join reads 2×|docs| tiny rows instead
      // of running the signature pass once PER SIDE.
      .localCheckpoint(false)
    val chunks = sim.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), c -> named_struct('chunk', c, 'key', (simhash div CAST(pow(2, c * 15) AS BIGINT)) % 32768))")).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val pairs = chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sim_a"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sim_b"))
      // Verify BEFORE deduplicating: bit_count is a codegen'd per-row op,
      // so running it on every collision row and deduplicating only the
      // few survivors beats a wide 4-column distinct over all ~340 k
      // collision rows (the chunk join emits one row per shared chunk —
      // bounded ×4 multiplicity, same pairs either way).
      .withColumn("hamming", bit_count(expr("sim_a ^ sim_b")))
      .filter(col("hamming") <= 3)
      .distinct()
    pairs
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** q31 — document fingerprinting: whitespace-normalized content hash
    * (D6 change detection) + the minimum rolling char-8-gram hash (the
    * "winnowing" fingerprint a near-dup pre-filter would index). */
  def q31Fingerprint(t: T): DataFrame =
    t.documents
      .withColumn("norm", lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      // One map-side pass via the native MinGramHash expression — the same
      // h60 value per position, min'd in a hand-written loop per row. The
      // r6 per-position explode (~300 rows/doc, the suite's slowest query
      // at 3.2 s) copied the whole norm string into every exploded row and
      // shuffled 300× the rows for a min; the array_min(transform(...))
      // fold was measured SLOWER still (4.9 s) because higher-order-
      // function lambdas evaluate through the interpreted expression
      // walker per element. The oracle replays the SQL composition
      // unchanged — the expression is value-identical by construction
      // (MinGramHashSpec pins it against the HOF form).
      .select(col("doc_id"), sha2(col("norm"), 256).as("content_hash"),
        expr("min_gram_hash(norm, 7, 8)").as("min_gram_hash"))
      .orderBy("doc_id")

  /** q70 — exact word-bigram Jaccard near-dup pairs over 30-word document
    * prefixes, blocked on the first three words (the dedup family's
    * exact-n-gram member alongside MinHash q27 / SimHash q28 / embedding
    * q65). Candidate pairs come from a block equi-join — block sizes are
    * data-bounded (a handful of docs share a 3-word prefix), so the pair
    * count is Σ|block|² — and Jaccard is the native codegen'd
    * `bigram_jaccard` over the two ≤30-word arrays, evaluated only on
    * candidate pairs. Two rejected shapes, both measured: the
    * counting-join (explode grams, join on (blk, gram), count pairs)
    * shuffles every gram occurrence (~30× the rows); materializing
    * per-doc gram arrays with `array_distinct(transform(...))` +
    * `array_intersect` walks every element through the interpreted HOF
    * evaluator on BOTH sides of the self-join (~6 s of the 9 s total at
    * sf0.1 — the q31 lesson again). The 31-limit split tokenizes only
    * the prefix, so a multi-MB document costs its first ~30 words, not a
    * full-text split. */
  /** q81 — dedup survivor manifest: the step AFTER near-dup pair mining
    * that every pipeline actually needs. MinHash pairs (the q27 chain,
    * jaccard ≥ 0.8) become edges of a duplicate graph; connected
    * components (Clustering.ccMinLabels — driver union-find under the
    * small-graph bound, min-label propagation with pointer jumping past
    * it) group transitive duplicates; each document maps to its
    * component's minimum doc_id as the canonical survivor. One row per
    * document: keep the canonicals, drop the rest.
    *
    * Transitivity is deliberate (A≈B≈C collapses to one survivor even
    * when A,C don't pair directly) — the standard MinHash-cluster-keep-one
    * shape. The oracle replays the pair chain and closes it with a
    * recursive transitive-closure CTE, feasible because near-dup pair
    * graphs are sparse by construction at any scale. */
  /** The q27 near-dup pair manifest MATERIALIZED once per (JVM, sf dir),
    * mirroring the staging-table treatment of the poll unpivot
    * (`Polls.stgPollResultsTable`): a dedup pipeline lands its pair
    * manifest as a table and every downstream consumer (survivor
    * manifest, audit reports) reads that table instead of re-running
    * shingling + minhash + banding + verify per query. At 100 TB the
    * pair manifest is exactly the artifact a warehouse would persist —
    * the full chain costs one corpus scan; re-deriving it per consumer
    * would cost one per query. Rows are identical to q27's output, so
    * the oracle contract is untouched. */
  /** q84 — exact substring-SPAN dedup (the Lee et al. 2022 training-data
    * stage, "Deduplicating Training Data Makes Language Models Better":
    * remove text spans that appear verbatim in other documents, not just
    * whole near-dup documents). Fixed-width approximation of the
    * suffix-array form: an 8-word gram occurring in ≥2 DISTINCT documents
    * marks its 8 word positions in every document carrying it; the
    * cleaned text is the uncovered words rejoined. Output per document:
    * word count, distinct duplicated grams present, positions removed,
    * and the cleaned text (whitespace-normalized rejoin, so untouched
    * docs round-trip exactly).
    *
    * 100 TB design: the only corpus-wide shuffle is the gram aggregate —
    * the same equi-join discipline as q79 decontamination (never
    * doc×doc); position recovery and span marking are per-document
    * array work that stays map-side after the hit join, and the final
    * join is doc-keyed. Cross-doc duplication only (a gram repeated
    * WITHIN one doc is repetition, q73's signal, not contamination). */
  def q84SpanDedup(t: T): DataFrame = spanDedup(t.documents)

  /** The reusable span-dedup core over (doc_id, text) rows — public so
    * specs drive hand-built corpora through the identical pipeline. */
  def spanDedup(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    // The gram string exists only transiently in the map-side projection;
    // the shuffle carries its 60-bit md5 hash (8 bytes vs ~50-byte
    // strings — at 100 TB the gram exchange is the whole cost). The
    // oracle applies the IDENTICAL hash, so both engines agree even in
    // the (≈2^-60-scale) collision case; a collision is a false-positive
    // marking, the conservative direction for contamination removal.
    val grams = base
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(w) - 8), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]))"))
        .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), expr(h60(84, "gram")).as("gh"))
      // feeds the dup aggregate AND the hit join; without truncation each
      // consumer re-runs the shingle explode + md5 pass (the q27-family
      // 2-consumer treatment — lazy, MEMORY_AND_DISK, spills). r12
      // measured both alternatives under the tmpfs-scratch harness and
      // kept this shape: dropping the checkpoint (recompute) was ~2×
      // slower, and a single-exchange gh-keyed collect_list(struct(doc,
      // pos)) aggregate feeding both the dup test and the hit explode was
      // ~1.7× slower — the object aggregate materializes the whole gram
      // stream in list buffers and drops out of whole-stage codegen,
      // losing more CPU than the saved exchange's I/O.
      .localCheckpoint(false)
    // "≥2 distinct docs" as min≠max — a plain one-shuffle aggregate with
    // map-side partials, where count(DISTINCT doc_id) planned a second
    // dedup pass over the gram exchange
    val dup = grams.groupBy("gh")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("gh")
    // (doc_id, pos) is unique by construction and dup is unique by gh, so
    // the join preserves row uniqueness → collect_list(pos) is already a
    // set; distinct-gram count via collect_set's in-buffer dedup, keeping
    // the aggregate a single ObjectHashAggregate (mixing countDistinct
    // with a collect forced an Expand double-pass over the hit rows)
    val hits = grams
      .join(dup, Seq("gh")) // gram-hash equi-join, the one corpus-wide shuffle
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).as("ps"),
        size(collect_set(col("gh"))).cast("long").as("n_dup_grams"))
      .withColumn("covered",
        array_distinct(flatten(expr("transform(ps, p -> sequence(p, p + 7))"))))
      .select("doc_id", "n_dup_grams", "covered")
    base
      .join(hits, Seq("doc_id"), "left")
      .withColumn("covered", coalesce(col("covered"), array()))
      // hash-based set difference keeps this O(n) per doc (an
      // array_contains membership test per position was O(n·|covered|) —
      // quadratic exactly on the saturated docs where it matters);
      // array_except preserves the left argument's order, so the rejoin
      // order is document order
      .withColumn("kept", expr(
        "transform(array_except(sequence(0, size(w) - 1), covered), " +
          "i -> element_at(w, i + 1))"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        size(col("covered")).as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  def minhashPairsTable(t: T): DataFrame = {
    val path = pairsCache.computeIfAbsent(t.sfDir, { _ =>
      // Nested under the JVM-scoped scratch root, keyed injectively by
      // sfDir (URL encoding, not hashCode — a 32-bit collision would
      // silently serve one sf dir's pairs for another), swept by the
      // TmpDirs shutdown hook — same leak fix as q82.
      val out = graft.TmpDirs.keyed("graft_minhash_pairs_", t.sfDir)
      q27MinhashNearDup(t).write.mode("overwrite").parquet(out)
      out
    })
    t.spark.read.parquet(path).select("doc_a", "doc_b", "jaccard")
  }
  private val pairsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q81DedupSurvivors(spark: org.apache.spark.sql.SparkSession, t: T): DataFrame = {
    val pairs = minhashPairsTable(t).select("doc_a", "doc_b")
    val eb = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    val labels = Clustering.ccMinLabels(spark,
      t.documents.select(col("doc_id").as("qid")), eb, eb.count(),
      maxIter = 30, smallGraphBound = Clustering.SmallGraphEdgeBound)
    val out = labels
      .select(col("qid").as("doc_id"), col("label").as("canonical_id"),
        (col("qid") === col("label")).as("is_canonical"))
      .localCheckpoint(false)
      .orderBy("doc_id")
    eb.unpersist(false)
    out
  }

  def q70NgramJaccard(t: T): DataFrame = {
    val base = t.documents
      .select(col("doc_id"),
        slice(split(trim(col("text")), "\\s+", 31), 1, 30).as("words"))
      // <2 words → no bigrams; the oracle excludes them identically
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"),
        array_join(slice(col("words"), 1, 3), " ").as("blk"), col("words"))
    base.select(col("doc_id").as("doc_a"), col("blk"),
        col("words").as("words_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("blk"),
        col("words").as("words_b")), Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", expr("bigram_jaccard(words_a, words_b)"))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** q109 — INCREMENTAL dedup: the daily-crawl shape the within-corpus
    * families (q24/q27) and the streaming form (q98) leave open — dedup
    * an incoming batch against the STORED corpus without touching
    * corpus×corpus pairs. The stored side is a canonical signature
    * index (signature → min doc_id, the table a production pipeline
    * persists between runs — here derived in-query from the even-id
    * half so the oracle can replay it); the batch side (odd ids)
    * computes its signature map-side with the native `minhash12` and
    * LEFT-joins the index on the full 12/12 signature string: one
    * signature-keyed equi-shuffle, never all-pairs, and at 100 TB the
    * stored index is bucketed by signature (q101) so the daily join
    * shuffles ONLY the new batch. Documents under 3 words carry no
    * signature and are excluded, the q98 rule. */
  def q109IncrementalDedup(t: T): DataFrame = {
    val sigs = t.documents
      .withColumn("sig", expr("minhash12(text).mh"))
      .filter(col("sig").isNotNull)
    incrementalDedup(
      sigs.filter(col("doc_id") % 2 === 1),
      sigs.filter(col("doc_id") % 2 === 0))
  }

  /** Core over (doc_id, sig) frames — `batch` is the increment, `corpus`
    * the stored history (q109 derives both from the parity split so the
    * oracle can replay them; a production caller passes its real stored
    * index). The index canonicalizes to min doc_id per signature and the
    * batch LEFT-joins it on the RAW 12-long signature array — the
    * shuffle carries 96 bytes of longs per row, no rendered string. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame): DataFrame = {
    val index = corpus.groupBy("sig").agg(min("doc_id").as("dup_of"))
    batch.select("doc_id", "sig")
      .join(index, Seq("sig"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
      .orderBy("doc_id")
  }
}
