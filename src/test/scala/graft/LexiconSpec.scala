package graft

import graft.operators.Lexicon
import org.apache.spark.sql.functions._

/** The vocabulary-realistic lexicon corpus: determinism, the rank→word
  * spelling against a Scala reference implementation, the zipf shape
  * claims (top-word share, band coverage, length/frequency
  * anti-correlation), and the doc-length spread. The cross-engine
  * replay itself is pinned by the q171–q174 oracle gate; these tests
  * pin the REALISM claims the corpus exists to provide. */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  private def seedDocs(n: Int) =
    (0L until n.toLong).map(i => (i, "en", "s"))
      .toDF("doc_id", "lang", "source")

  private lazy val corpus = Lexicon.lexDocuments(seedDocs(400)).cache()

  /** Scala reference of the base-16 syllable spelling. */
  private def wordRef(r: Long): String = {
    def syl(d: Long) = Lexicon.SylTab.substring(2 * d.toInt, 2 * d.toInt + 2)
    if (r < 16) syl(r)
    else if (r < 256) syl(r / 16) + syl(r % 16)
    else if (r < 4096) syl(r / 256) + syl((r / 16) % 16) + syl(r % 16)
    else syl(r / 4096) + syl((r / 256) % 16) + syl((r / 16) % 16) + syl(r % 16)
  }

  /** Pure-JVM reference of the WHOLE derivation — md5 through
    * MessageDigest, rank draw, tail redraw, length draw — sharing NO
    * code with either SQL renderer. The oracle gate proves Spark ≡
    * DuckDB; this proves both ≡ the specified arithmetic (a mistake
    * shared by the two renderers would pass the gate). */
  private def h60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
  /** Fixed-4-syllable spelling (compound halves). */
  private def word4Ref(r: Long): String = {
    def syl(d: Long) = Lexicon.SylTab.substring(2 * d.toInt, 2 * d.toInt + 2)
    syl(r / 4096) + syl((r / 256) % 16) + syl((r / 16) % 16) + syl(r % 16)
  }
  private def textRef(docId: Long): String = {
    val hl = h60Ref(s"171:$docId")
    val tail = if ((hl / 128) % 20 == 0) (hl / 4096) % 400 else 0L
    val n = 8 + hl % 93 + tail
    (0L until n).map { p =>
      val hw = h60Ref(s"1710:$docId:$p")
      val m = 1 + hw % Lexicon.M
      val rr = Lexicon.K / (m * m * m * m)
      if (rr <= Lexicon.V) wordRef(rr)
      else {
        val t1 = 1 + (hw / 65536) % Lexicon.V
        val t2 = 1 + ((hw / 65536) / Lexicon.V) % Lexicon.V
        word4Ref(t1) + word4Ref(t2)
      }
    }.mkString(" ")
  }

  test("the Spark renderer reproduces an independent pure-JVM " +
    "reference of the construction, doc for doc") {
    val got = Lexicon.lexDocuments(seedDocs(25))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    (0L until 25L).foreach { id =>
      assert(got(id) == textRef(id), s"doc $id diverges from reference")
    }
  }

  test("deterministic: two derivations are frame-identical") {
    val a = Lexicon.lexDocuments(seedDocs(50))
    val b = Lexicon.lexDocuments(seedDocs(50))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("every token is a valid rank spelling: a lexicon rank ≤ V, or a " +
    "16-char compound of two fixed-4 halves (collision-free encodings)") {
    val plain = (1L to Lexicon.V).map(wordRef).toSet
    val halves = (1L to Lexicon.V).map(word4Ref).toSet
    val words = corpus
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    val bad = words.filterNot { w =>
      if (w.length < 16) plain.contains(w)
      else w.length == 16 && halves.contains(w.take(8)) &&
        halves.contains(w.drop(8))
    }
    assert(bad.isEmpty, s"unspellable tokens: ${bad.take(5).mkString(",")}")
    // both regimes present, and no plain spelling can reach 16 chars —
    // the encodings are disjoint by length
    assert(words.exists(_.length == 16) && words.exists(_.length <= 8))
    assert(plain.forall(_.length <= 8))
  }

  test("zipf shape: top-word share ~16%, every low band populated, " +
    "frequency anti-correlates with word length") {
    val counts = corpus
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .cache()
    val total = counts.agg(sum("c")).as[Long].head()
    val top = counts.orderBy(col("c").desc).limit(1)
      .select("w", "c").as[(String, Long)].head()
    // rank 1 spells "de"; share P(r=1) = 1 − ((K/2)^(1/4))/M ≈ 0.159
    assert(top._1 == wordRef(1L))
    val share = top._2.toDouble / total
    assert(share > 0.12 && share < 0.20, s"top-word share $share")
    // the mean length of the 10 most frequent words must be well below
    // the mean length of the 10 least frequent (Zipf abbreviation)
    val byFreq = counts.orderBy(col("c").desc, col("w")).as[(String, Long)]
      .collect()
    val headLen = byFreq.take(10).map(_._1.length).sum / 10.0
    val tailLen = byFreq.takeRight(10).map(_._1.length).sum / 10.0
    assert(headLen < tailLen - 2, s"head $headLen vs tail $tailLen")
    // df bands: a zipf corpus fills every count band from hapax up to
    // the top word's band contiguously
    val bands = counts.select(length(expr("bin(c)")).as("band"))
      .distinct().as[Int].collect().sorted
    assert(bands.head == 1 && bands.toSeq == (1 to bands.max).toSeq,
      s"bands not contiguous from 1: ${bands.mkString(",")}")
    counts.unpersist()
  }

  test("doc lengths: min ≥ 8, heavy tail present, mean near 64") {
    val lens = corpus.select(size(split(col("text"), " ")).as("n"))
      .as[Int].collect()
    assert(lens.min >= 8)
    assert(lens.max > 150, s"no heavy tail: max ${lens.max}")
    val mean = lens.sum.toDouble / lens.length
    assert(mean > 50 && mean < 80, s"mean length $mean")
  }

  test("vocabulary grows with the corpus (Heaps), unlike the shipped " +
    "generator's 31-word cap") {
    def vocab(n: Int): Long = Lexicon.lexDocuments(seedDocs(n))
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    val v100 = vocab(100)
    val v800 = vocab(800)
    assert(v100 > 1000, s"v100 = $v100")
    assert(v800 > v100 * 2, s"no growth: $v100 → $v800")
    // the compound tail keeps type growth alive past the plain lexicon:
    // the type space is V² ≈ 9·10⁸, so no corpus this engine will meet
    // saturates it (the r17 advice watch item, closed by construction)
    assert(Lexicon.V * Lexicon.V > 100000000L)
  }

  // ── multi-language corpus (q176/q177) ─────────────────────────────

  private def mWordRef(tab: String, r: Long): String = {
    def syl(d: Long) = tab.substring(2 * d.toInt, 2 * d.toInt + 2)
    if (r < 16) syl(r)
    else if (r < 256) syl(r / 16) + syl(r % 16)
    else if (r < 4096) syl(r / 256) + syl((r / 16) % 16) + syl(r % 16)
    else syl(r / 4096) + syl((r / 256) % 16) + syl((r / 16) % 16) + syl(r % 16)
  }
  private def mWord4Ref(tab: String, r: Long): String = {
    def syl(d: Long) = tab.substring(2 * d.toInt, 2 * d.toInt + 2)
    syl(r / 4096) + syl((r / 256) % 16) + syl((r / 16) % 16) + syl(r % 16)
  }
  /** Pure-JVM reference of the multi-language derivation (seeds
    * 176/1760, per-language syllable table) — shares no code with
    * either SQL renderer. */
  private def mTextRef(docId: Long, lang: String): String = {
    val tab = Lexicon.sylTabFor(Lexicon.MultiLangs.indexOf(lang))
    val hl = h60Ref(s"176:$docId")
    val tail = if ((hl / 128) % 20 == 0) (hl / 4096) % 400 else 0L
    val n = 8 + hl % 93 + tail
    (0L until n).map { p =>
      val hw = h60Ref(s"1760:$docId:$p")
      val m = 1 + hw % Lexicon.M
      val rr = Lexicon.K / (m * m * m * m)
      if (rr <= Lexicon.V) mWordRef(tab, rr)
      else {
        val t1 = 1 + (hw / 65536) % Lexicon.V
        val t2 = 1 + ((hw / 65536) / Lexicon.V) % Lexicon.V
        mWord4Ref(tab, t1) + mWord4Ref(tab, t2)
      }
    }.mkString(" ")
  }

  private def multiSeedDocs(n: Int) =
    (0L until n.toLong).map(i =>
      (i, Lexicon.MultiLangs((i % 5).toInt), "s"))
      .toDF("doc_id", "lang", "source")

  test("multi-language: the five syllable inventories are pairwise " +
    "disjoint, so no word form can belong to two languages") {
    val tabs = Lexicon.MultiLangs.indices.map(Lexicon.sylTabFor)
    val invs = tabs.map(t => t.grouped(2).toSet)
    assert(invs.forall(_.size == 16))
    for (i <- invs.indices; j <- invs.indices if i < j)
      assert(invs(i).intersect(invs(j)).isEmpty, s"tables $i,$j collide")
    // and hence the top-10 stop lists are pairwise disjoint too
    val lists = Lexicon.MultiLangs.indices
      .map(i => Lexicon.topWords(i, Lexicon.LangidK).toSet)
    for (i <- lists.indices; j <- lists.indices if i < j)
      assert(lists(i).intersect(lists(j)).isEmpty)
  }

  test("multi-language: the Spark renderer reproduces the pure-JVM " +
    "reference per language, doc for doc") {
    val got = Lexicon.multiLexDocuments(multiSeedDocs(25))
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    assert(got.length == 25 && got.map(_._2).distinct.length == 5)
    got.foreach { case (id, lang, text) =>
      assert(text == mTextRef(id, lang), s"doc $id ($lang) diverges")
    }
  }

  test("multi-language: every token of a language's text spells from " +
    "that language's inventory — the disjointness the langid relies on") {
    val inv = Lexicon.MultiLangs.indices
      .map(i => Lexicon.MultiLangs(i) -> Lexicon.sylTabFor(i).grouped(2).toSet)
      .toMap
    val rows = Lexicon.multiLexDocuments(multiSeedDocs(60))
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .distinct().as[(String, String)].collect()
    rows.foreach { case (lang, w) =>
      val syls = w.grouped(2).toSeq
      assert(syls.forall(inv(lang).contains),
        s"$lang token $w uses foreign syllables")
    }
  }

  test("langid confusion matrix: diagonal whenever a doc has any " +
    "top-10 hit; zero-hit docs tie to 'de' (the fixed tie order)") {
    // recompute hits in plain Scala and compare the matrix cells
    val docs = Lexicon.multiLexDocuments(multiSeedDocs(200))
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect()
    val lists = Lexicon.MultiLangs.indices
      .map(i => Lexicon.topWords(i, Lexicon.LangidK).toSet)
    val expected = docs.map { case (_, lang, text) =>
      val words = text.split(" ")
      val hits = lists.map(l => words.count(l.contains))
      val pred = // the q30 >= chain in tie order de,en,es,fr,zh
        Lexicon.MultiLangs(hits.indices.minBy(i => (-hits(i), i)))
      (lang, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    // drive q176's scoring core over the same frame by swapping the
    // documents table: build a tiny T-like call through the public API
    val got = Lexicon.q176LexLangidOver(
      Lexicon.multiLexDocuments(multiSeedDocs(200)))
      .select("true_lang", "predicted_lang", "n_docs")
      .as[(String, String, Long)].collect()
      .map { case (t, p, n) => (t, p) -> n }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("langid abstain (q185): a zero-hit document predicts 'und', not " +
    "the tie order's first entry; scored documents are unaffected") {
    // hand frame through the public scoring core: one zh doc whose words
    // are all rarer than any top-10 list (zero hits everywhere), one de
    // doc containing de's rank-1 word
    val deTop = Lexicon.topWords(0, 1).head
    val docs = Seq(
      (1L, "zh", "zzzz qqqq"),
      (2L, "de", s"$deTop zzzz")).toDF("doc_id", "lang", "text")
    val abstain = Lexicon.q176LexLangidOver(docs, abstain = true)
      .select("true_lang", "predicted_lang", "sum_hits")
      .as[(String, String, Long)].collect().toSet
    assert(abstain == Set(("zh", "und", 0L), ("de", "de", 1L)))
    // without abstain the zero-hit doc lands on 'de' (q176's residual)
    val tied = Lexicon.q176LexLangidOver(docs)
      .select("true_lang", "predicted_lang")
      .as[(String, String)].collect().toSet
    assert(tied == Set(("zh", "de"), ("de", "de")))
  }

  test("q182/q183 store split: the base-trained store differs from the " +
    "full-corpus q180 model only through the withheld batch, and the " +
    "batch itself carries genuine OOV words") {
    // the lexicon's compound hapax tail guarantees today's batch brings
    // unseen types — the OOV column must be nonzero somewhere, and every
    // cell's OOV count stays below its word count (the head is shared)
    val t = graft.Tables.T(spark, "/root/testdata/sf0.001")
    val out = Lexicon.q183LexBpeEncodeStore(t)
      .select("n_words", "n_oov_words", "n_skipped_words")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._2).sum > 0, "no OOV words — the tail claim broke")
    out.foreach { case (w, o, s) =>
      assert(o < w, "a cell is ALL OOV — the shared head vanished")
      assert(s == 0L, "the lexicon corpus plants no '|'/'\\' words")
    }
  }

  test("drift report (q179): masses partition the token stream, band 0 " +
    "is exactly the delta-only vocabulary, shares sum to ~1e6") {
    val docs = Lexicon.lexDocuments(seedDocs(300))
    val out = Lexicon.q179LexDriftOver(docs)
      .select("band", "n_types", "occ_base", "occ_delta",
        "share_base_ppm", "share_delta_ppm")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    // independent recompute of the split and the band-0 contract
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
      .as[(Long, String)].collect()
    val base = toks.filter(_._1 % 10 != 0).map(_._2)
    val delta = toks.filter(_._1 % 10 == 0).map(_._2)
    assert(out.map(_._3).sum == base.length, "base mass partitions")
    assert(out.map(_._4).sum == delta.length, "delta mass partitions")
    val band0 = out.find(_._1 == 0).get
    val newTypes = (delta.toSet -- base.toSet).size
    assert(band0._2 == newTypes, s"band-0 types ${band0._2} vs $newTypes")
    assert(band0._3 == 0L, "band 0 carries no base occurrences")
    // integer-floor shares: each side sums into (1e6 - nBands, 1e6]
    val sb = out.map(_._5).sum
    val sd = out.map(_._6).sum
    assert(sb > 1000000L - out.length && sb <= 1000000L, s"sb=$sb")
    assert(sd > 1000000L - out.length && sd <= 1000000L, s"sd=$sd")
  }

  test("ppm rarity: integer score is scale-free across corpus sizes") {
    def meanPpm(n: Int): Double = {
      val r = graft.operators.Corpus.rarityScorePpm(
        Lexicon.lexDocuments(seedDocs(n)), Lexicon.RarePpmLt, Lexicon.MidPpmLt)
      r.agg(avg("freq_ppm")).as[Double].head()
    }
    val small = meanPpm(100)
    val big = meanPpm(800)
    // E[freq_ppm] = 10^6·Σp² — the same mass point at any corpus size
    assert(math.abs(small - big) / big < 0.15, s"$small vs $big")
  }
}
