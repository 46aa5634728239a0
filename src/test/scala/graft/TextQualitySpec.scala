package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.Row

/** Repetition signals (q73) and PII scrub (q74) on hand-computed corpora.
  * The q73 core claim — most-common-item frequency == longest equal run of
  * the sorted array — is exercised against brute-force counting here; the
  * q74 patterns against texts with zero, one, and multiple hits per kind. */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private def rep(text: String): Row =
    TextAnalysis.repetitionSignals(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head

  test("repetition: counts on a dense repeat") {
    // words: a a a b → 4 words, 2 distinct, top word a×3
    // bigrams: "a a", "a a", "a b" → top bigram ×2 over 3 bigrams
    val r = rep("a a a b")
    assert(r.getAs[Int]("n_words") == 4)
    assert(r.getAs[Int]("n_distinct") == 2)
    assert(r.getAs[Int]("top_word_count") == 3)
    assert(r.getAs[Int]("top_bigram_count") == 2)
    assert(r.getAs[Double]("dup_word_frac") == 0.5)
    assert(r.getAs[Double]("top_bigram_frac") == 2.0 / 3.0)
    assert(!r.getAs[Boolean]("keep")) // top_bigram_frac 0.67 > 0.10
  }

  test("repetition: all-distinct text keeps") {
    val r = rep("one two three four five six seven eight nine ten eleven")
    assert(r.getAs[Int]("top_word_count") == 1)
    assert(r.getAs[Double]("dup_word_frac") == 0.0)
    assert(r.getAs[Int]("top_bigram_count") == 1)
    assert(r.getAs[Boolean]("keep"))
  }

  test("repetition: longest-run == brute-force max frequency (random)") {
    val rnd = new scala.util.Random(73)
    (1 to 25).foreach { _ =>
      val words = Seq.fill(1 + rnd.nextInt(40))(s"w${rnd.nextInt(6)}")
      val expected = words.groupBy(identity).values.map(_.size).max
      assert(rep(words.mkString(" ")).getAs[Int]("top_word_count") == expected,
        s"corpus: ${words.mkString(" ")}")
    }
  }

  test("repetition: run counter resets between items") {
    // sorted: x x y y — two runs of 2; a buggy non-resetting counter says 4
    assert(rep("x y x y").getAs[Int]("top_word_count") == 2)
  }

  test("top_gram_count == HOF sort+fold composition (random, n=1 and n=2)") {
    val rnd = new scala.util.Random(173)
    val rows = (1 to 20).map { _ =>
      Tuple1(Seq.fill(2 + rnd.nextInt(30))(s"t${rnd.nextInt(5)}")) }
    val df = rows.toDF("words")
    val hof =
      "aggregate(array_sort(a), struct('' as prev, 0 as run, 0 as best), " +
        "(acc, x) -> struct(x as prev, " +
        "if(x = acc.prev, acc.run + 1, 1) as run, " +
        "greatest(acc.best, if(x = acc.prev, acc.run + 1, 1)) as best), " +
        "acc -> acc.best)"
    // n=1: fold over the words; n=2: fold over explicitly built bigrams
    val bigrams = "zip_with(slice(words, 1, size(words) - 1), " +
      "slice(words, 2, size(words) - 1), (x, y) -> concat(x, ' ', y))"
    val both = df.selectExpr(
      "top_gram_count(words, 1) as native1",
      s"${hof.replaceAll("\\ba\\b", "words")} as hof1",
      "top_gram_count(words, 2) as native2",
      s"${hof.replaceAll("\\ba\\b", bigrams)} as hof2"
    ).collect()
    both.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"n=1 mismatch: $r")
      assert(r.getInt(2) == r.getInt(3), s"n=2 mismatch: $r")
    }
  }

  test("top_gram_count edges: fewer elements than n, and misuse") {
    val df = Seq(Tuple1(Seq("only"))).toDF("words")
    val r = df.selectExpr("top_gram_count(words, 2) as c2",
      "top_gram_count(words, 1) as c1").collect().head
    assert(r.getInt(0) == 0 && r.getInt(1) == 1)
    val err = intercept[Exception] {
      Seq(Tuple1("not an array")).toDF("s")
        .selectExpr("top_gram_count(s, 1)").collect()
    }
    assert(err.getMessage.contains("array<string>"))
  }

  private def pii(text: String): Row =
    TextAnalysis.piiSignals(Seq(Tuple1(text)).toDF("text")).collect().head

  test("pii: email and phone both found and redacted") {
    val r = pii("mail a.b@x-y.example.com or dial +49-30-1234 today")
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_phones") == 1)
    assert(r.getAs[Boolean]("has_pii"))
    assert(r.getAs[String]("redacted") == "mail <EMAIL> or dial <PHONE> today")
  }

  test("pii: multiple emails counted individually") {
    val r = pii("a@b.de then c.d@e.org end")
    assert(r.getAs[Int]("n_emails") == 2)
    assert(r.getAs[String]("redacted") == "<EMAIL> then <EMAIL> end")
  }

  test("pii: clean text untouched") {
    val r = pii("nothing sensitive here, just words and 42 numbers")
    assert(r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_phones") == 0)
    assert(!r.getAs[Boolean]("has_pii"))
    assert(r.getAs[String]("redacted") == "nothing sensitive here, just words and 42 numbers")
  }

  test("pii: phone needs the international +CC- prefix") {
    assert(pii("plain 030-1234 is not matched").getAs[Int]("n_phones") == 0)
  }

  // --- q100 hashed-feature classifier inference ---

  /** Brute-force recompute: JVM md5 → first 15 hex chars → long → bucket
    * → weight, token multiplicity preserved. */
  private def bruteLogit(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map { tok =>
      val hex = md.digest(s"100:$tok".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val bucket = (java.lang.Long.parseLong(hex, 16) % 1024L).toInt
      TextAnalysis.clfWeights(bucket)
    }.sum
  }

  private def clf(rows: Seq[(Long, String)]) =
    TextAnalysis.qualityClf(rows.toDF("doc_id", "text")).collect()

  test("clf: logit matches the brute-force hash+weight sum, multiplicity kept") {
    val texts = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the repeated token weighting"),
      (3L, "  Mixed CASE   and   extra   spaces  "),
      (4L, "einzeln"))
    val out = clf(texts)
    for ((r, (_, text)) <- out.zip(texts)) {
      assert(r.getAs[Long]("logit") == bruteLogit(text), text)
      assert(r.getAs[Boolean]("keep") == (bruteLogit(text) > 0), text)
    }
    // doc 2: 3× "the" must count three times, not once
    assert(out(1).getAs[Int]("n_tokens") == 6)
  }

  test("clf: random corpora agree with brute force") {
    val rnd = new scala.util.Random(100)
    val vocab = Vector("alpha", "beta", "Gamma", "δΔ", "42", "x-y", "...")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    for ((r, (_, text)) <- clf(docs).zip(docs))
      assert(r.getAs[Long]("logit") == bruteLogit(text), text)
  }

  // ── q119 DSIR importance resampling ─────────────────────────────────

  private def dsir(rows: Seq[(Long, String, String)], keep: Int) =
    TextAnalysis.dsirResample(
      rows.toDF("doc_id", "text", "lang"), "en", keep)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(4)))
      .toList

  test("dsir: target-like documents outrank off-target ones") {
    // two disjoint vocabularies, 30 words each → the importance-weight
    // gap (~tens of nats) dwarfs the bounded Gumbel perturbation
    val tgt = (1 to 30).map(i => s"tgt$i").mkString(" ")
    val off = (1 to 30).map(i => s"off$i").mkString(" ")
    val rows = Seq(
      (1L, tgt, "en"), (2L, tgt, "en"), (3L, tgt, "en"),
      (4L, off, "xx"), (5L, off, "xx"), (6L, off, "xx"))
    val picked = dsir(rows, keep = 3).map(_._1).toSet
    assert(picked == Set(1L, 2L, 3L))
  }

  test("dsir: replayable — two runs pick identical survivors and keys") {
    val rnd = new scala.util.Random(119)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rows = (1L to 40L).map(i => (i,
      Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "),
      if (i % 3 == 0) "en" else "xx"))
    assert(dsir(rows, 10) == dsir(rows, 10))
  }

  test("dsir: n_grams = 2·len−1 (unigrams + bigrams); 1-word docs survive") {
    val rows = Seq(
      (1L, "a b c d", "en"),   // 4 unigrams + 3 bigrams
      (2L, "solo", "xx"))      // 1 unigram, no bigram leg
    val byDoc = dsir(rows, 2).map(t => t._1 -> t._2).toMap
    assert(byDoc(1L) == 7L)
    assert(byDoc(2L) == 1L)
  }

  // ── q121 Gopher rule battery ────────────────────────────────────────

  private def gopher(rows: Seq[(Long, String)]) =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("gopher: a clean 50+-word doc with stopwords passes every rule") {
    val good = (("the of " + "alpha beta gamma " * 16).trim)  // 50 words
    val r = gopher(Seq((1L, good)))(1L)
    assert(r.getAs[Int]("n_words") == 50)
    for (rule <- Seq("r_wc", "r_mwl", "r_sym", "r_alpha", "r_stop", "keep"))
      assert(r.getAs[Boolean](rule), rule)
  }

  test("gopher: each rule fails independently on a targeted violation") {
    val pad = "the of " + "word " * 48                         // 50 words, passes
    val out = gopher(Seq(
      (1L, "the of too short"),                                // r_wc (4 words)
      (2L, "the of " + "ab " * 48),                            // r_mwl: mean < 3
      (3L, ("the of " + "word " * 42 + "### " * 6).trim),      // r_sym: 6/50 > 0.1
      (4L, ("the of " + "word " * 37 + "123 " * 11).trim),     // r_alpha: 39/50 < .8
      (5L, ("the " + "word " * 49).trim),                      // r_stop: 1 distinct
      (6L, pad.trim)))
    assert(!out(1L).getAs[Boolean]("r_wc") && !out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("r_mwl") && out(2L).getAs[Boolean]("r_wc"))
    assert(!out(3L).getAs[Boolean]("r_sym") && out(3L).getAs[Boolean]("r_mwl"))
    assert(!out(4L).getAs[Boolean]("r_alpha") && out(4L).getAs[Boolean]("r_sym"))
    assert(!out(5L).getAs[Boolean]("r_stop") && out(5L).getAs[Boolean]("r_alpha"))
    assert(out(6L).getAs[Boolean]("keep"))
  }

  test("gopher: ratios are exact int/int divisions") {
    val r = gopher(Seq((1L, "the be cat 42")))(1L)
    assert(r.getAs[Double]("mean_word_len") == 10.0 / 4)
    assert(r.getAs[Double]("alpha_frac") == 3.0 / 4)
    assert(r.getAs[Int]("n_stop_distinct") == 2)
  }
}
