package graft

import graft.functions.{BigramJaccard, BloomBits, ClaimPcts, CmsSketch, HeavyHitters, HistSketch, HllDistinct, HllMergeRegs, HllRegs, KmvSketch, Max2, MinGramHash, MinhashSigs, PdfText, ShingleJaccard, SimHash60, SparseCosine, StancePct, TokenCounts, TopGramCount, TopK, TrigramSet, TrigramSimSorted, TrigramSimilarity, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions registering the engine's native Catalyst functions.
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * — the public extension point, so user sessions (and spark-sql shells)
  * get the functions without touching Spark internals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** One registration per function: the arity check and WRONG_NUM_ARGS
    * shape are identical for every entry, so they live here once — a new
    * function is a one-liner and cannot mis-copy its own name/arity into
    * the error message. `usage` populates DESCRIBE FUNCTION when a
    * contract is worth surfacing to SQL users. */
  private def inject(e: SparkSessionExtensions, name: String, arity: Int,
                     clazz: Class[_], usage: String = null)
                    (build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      if (usage == null) new ExpressionInfo(clazz.getName, name)
      else new ExpressionInfo(clazz.getName, null, name, usage, ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != arity)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> s"`$name`",
              "expectedNum" -> arity.toString,
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        build(exprs)
      }))

  private def intLit(fn: String, e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integer literal, got ${other.sql}")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "trigram_similarity", 2, classOf[TrigramSimilarity]) { x =>
      TrigramSimilarity(x.head, x(1))
    }
    inject(e, "bigram_jaccard", 2, classOf[BigramJaccard]) { x =>
      BigramJaccard(x.head, x(1))
    }
    // The usage note carries the parity precondition to ANY session user
    // (DESCRIBE FUNCTION shows it): bit-identity with the driver-path
    // cosineSparse holds because the engine's weights are integer-valued
    // (1.0 counts + 2.0 concept weights), making the FP sums exact in
    // any accumulation order. Fractional weights (e.g. tf-idf) are still
    // CORRECT cosines, but may differ from a Map-iteration-order sum in
    // the last ulps — don't pin goldens across the two paths then.
    inject(e, "sparse_cosine", 2, classOf[SparseCosine],
      usage = "sparse_cosine(a, b) - cosine similarity of two term-sorted " +
        "array<struct<term:string, w:double>> sparse vectors. " +
        "Exactly matches graft's driver-path cosineSparse only for " +
        "integer-valued weights (exact FP sums in any order); " +
        "fractional weights give a correct but order-dependent value.") { x =>
      SparseCosine(x.head, x(1))
    }
    inject(e, "min_gram_hash", 3, classOf[MinGramHash]) { x =>
      MinGramHash(x.head, intLit("min_gram_hash", x(1), "seed"),
        intLit("min_gram_hash", x(2), "gram_len"))
    }
    inject(e, "claim_pcts", 1, classOf[ClaimPcts])(x => ClaimPcts(x.head))
    inject(e, "stance_pct", 1, classOf[StancePct])(x => StancePct(x.head))
    inject(e, "token_counts", 1, classOf[TokenCounts])(x => TokenCounts(x.head))
    inject(e, "pdf_text", 1, classOf[PdfText],
      usage = "pdf_text(bin) - best-effort PDF text extraction " +
        "(FlateDecode + unfiltered content streams; non-PDF input yields '')")(
      x => PdfText(x.head))
    inject(e, "minhash12", 1, classOf[MinhashSigs])(x => MinhashSigs(x.head))
    inject(e, "shingle_jaccard", 2, classOf[ShingleJaccard]) { x =>
      ShingleJaccard(x.head, x(1))
    }
    inject(e, "simhash60", 1, classOf[SimHash60])(x => SimHash60(x.head))
    inject(e, "trigram_set", 1, classOf[TrigramSet])(x => TrigramSet(x.head))
    inject(e, "trigram_sim_sorted", 2, classOf[TrigramSimSorted],
      usage = "trigram_sim_sorted(ga, gb) - trigram Jaccard over two SORTED " +
        "distinct gram arrays (the trigram_set output contract); " +
        "value-identical to trigram_similarity on the original strings.") { x =>
      TrigramSimSorted(x.head, x(1))
    }
    inject(e, "top_gram_count", 2, classOf[TopGramCount],
      usage = "top_gram_count(words, n) - highest occurrence count of any " +
        "n-gram of adjacent elements in a string array (n = 1: the " +
        "elements themselves; n >= 2: space-joined adjacent runs). " +
        "0 when the array has fewer than n elements.") { x =>
      TopGramCount(x.head, intLit("top_gram_count", x(1), "gram size"))
    }
    inject(e, "vec_dot", 2, classOf[VecDot])(x => VecDot(x.head, x(1)))
    inject(e, "topk", 2, classOf[TopK],
      usage = "topk(expr, k) - the k largest values of expr in one pass as a " +
        "DESC-sorted array (multiset; duplicates kept). Orderable types " +
        "only; use topk(struct(score, id), k) for argmax-style top-k with " +
        "a total tie-break. k-slot heap partial-aggregates map-side — " +
        "grouped top-k without a per-group window sort.") { x =>
      TopK(x.head, intLit("topk", x(1), "k")).toAggregateExpression()
    }
    inject(e, "heavy_hitters", 2, classOf[HeavyHitters],
      usage = "heavy_hitters(expr, k) - SpaceSaving top-k heavy hitters as " +
        "array<struct<item, count, err>> sorted by (count DESC, item ASC). " +
        "true <= count <= true + err always; EXACT (err = 0) whenever the " +
        "group's distinct cardinality is <= k. Mergeable: partial sketches " +
        "combine pointwise and trim to k (Agarwal et al. 2012).") { x =>
      HeavyHitters(x.head, intLit("heavy_hitters", x(1), "k"))
        .toAggregateExpression()
    }
    inject(e, "hll_distinct", 1, classOf[HllDistinct],
      usage = "hll_distinct(expr) - deterministic HyperLogLog distinct sketch " +
        "(p = 9, portable md5 hash) as the exact-integer register summary " +
        "struct<n_zero, sum_rho, reg_fp, z_scaled>; the estimate is " +
        "0.7213/(1 + 1.079/512) * 512^2 * 2^52 / z_scaled, with linear " +
        "counting 512*ln(512/n_zero) when n_zero > 0 and the raw estimate " +
        "is <= 1280. Mergeable (pointwise register max); state is exactly " +
        "order- and partition-independent.") { x =>
      HllDistinct(x.head).toAggregateExpression()
    }
    inject(e, "cms_sketch", 1, classOf[CmsSketch],
      usage = "cms_sketch(expr) - Count-Min frequency sketch (4 x 256, " +
        "portable md5 row hashes) as the raw row-major array<bigint> " +
        "matrix. Point estimate: min over r of " +
        "element_at(m, r*256 + h60('130', r || ':' || item) % 256 + 1); " +
        "always >= the true count. Mergeable (pointwise sum); state is " +
        "exactly order- and partition-independent.") { x =>
      CmsSketch(x.head).toAggregateExpression()
    }
    inject(e, "bloom_bits", 1, classOf[BloomBits],
      usage = "bloom_bits(h) - Bloom filter over a bigint 60-bit-hash " +
        "column as 256 raw array<bigint> words (16384 bits, k = 3 " +
        "probes from disjoint 14-bit fields: h%16384, (h div 2^14)%16384, " +
        "(h div 2^28)%16384). Membership: all three probed bits set. No " +
        "false negatives; mergeable (pointwise OR); state is exactly " +
        "order- and partition-independent.") { x =>
      BloomBits(x.head).toAggregateExpression()
    }
    inject(e, "hll_regs", 1, classOf[HllRegs],
      usage = "hll_regs(expr) - the hll_distinct register file RAW as " +
        "array<int> (512 ranks), for persisting fine-grain sketches that " +
        "hll_merge_regs re-aggregates to coarser grains without a second " +
        "pass over raw data.") { x =>
      HllRegs(x.head).toAggregateExpression()
    }
    inject(e, "hll_merge_regs", 1, classOf[HllMergeRegs],
      usage = "hll_merge_regs(regs) - second-stage merge of hll_regs " +
        "arrays by pointwise max; exactly the register file a direct " +
        "sketch of the union would produce (max is idempotent, so " +
        "overlapping grains re-merge exactly).") { x =>
      HllMergeRegs(x.head).toAggregateExpression()
    }
    inject(e, "hist_sketch", 1, classOf[HistSketch],
      usage = "hist_sketch(v) - mergeable quantile histogram over " +
        "non-negative bigint values (HDR geometry: base-2 octaves x 16 " +
        "sub-buckets, 960 cells) as the raw array<bigint> of counts. " +
        "Bucket: v < 32 -> v, else (e-4)*16 + (v >> (e-4)) with " +
        "e = floor(log2 v); lower bound (the quantile estimate) is " +
        "(b%16 + 16) << (b div 16 - 1). Any quantile read from the " +
        "cumulative counts carries <= 1/16 relative error by " +
        "construction. Mergeable (pointwise sum); state is exactly " +
        "order- and partition-independent.") { x =>
      HistSketch(x.head).toAggregateExpression()
    }
    inject(e, "kmv_sketch", 2, classOf[KmvSketch],
      usage = "kmv_sketch(h, k) - K-Minimum-Values distinct sketch over a " +
        "non-negative bigint hash column: the k smallest DISTINCT values " +
        "as an ascending array<bigint>. Supports set operations between " +
        "groups (union/intersection/Jaccard estimates - see q132); exact " +
        "whenever the group has < k distinct values. Mergeable " +
        "(union-then-trim); state is exactly order- and " +
        "partition-independent.") { x =>
      KmvSketch(x.head, intLit("kmv_sketch", x(1), "k")).toAggregateExpression()
    }
    inject(e, "max2", 1, classOf[Max2],
      usage = "max2(expr) - the two largest values of expr in one pass, as " +
        "struct<first, second> (second is null for singleton groups; " +
        "ties land in second). Orderable types only; structs compare " +
        "lexicographically like Spark's own max.") { x =>
      Max2(x.head).toAggregateExpression()
    }
    // Optimizer rule: the naive `trigram_similarity(a, b) >= t` inner
    // join (which would plan as a nested-loop product) is rewritten to
    // the exact prefix-filtered equi-join — see the rule's scaladoc.
    // Opt-out: spark.graft.similarityJoin.rewrite=false.
    e.injectOptimizerRule(_ => graft.plans.SimilarityJoinRewrite)
    // Optimizer rule: a fixed-width range join (p BETWEEN lo AND lo + k,
    // which would plan as a nested-loop product) is rewritten to the
    // exact bucketed equi-join — see the rule's scaladoc. Opt-out:
    // spark.graft.rangeJoin.rewrite=false.
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}
