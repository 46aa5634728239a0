package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the native Catalyst expressions: each must agree
  * exactly with the composed SQL form it replaces on RANDOM inputs, not
  * just the curated fixture cases the unit specs pin. Generators include
  * multi-byte text, repeated tokens, and short/empty strings — the edge
  * shapes where a hand-written byte walk could diverge from the SQL
  * semantics. Sampling is seeded, so failures replay deterministically.
  */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen: Gen[String] = Gen.oneOf(
    "the", "quick", "fox", "über", "größe", "naïve", "東京", "a", "bb",
    "stream", "hash", "x1", "ß")
  private val textGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("trigram_similarity matches the HOF intersect/union form on random text") {
    val pairs = samples(Gen.zip(textGen, textGen), 80, 17L)
    val hof =
      """CASE WHEN length(a) < 3 AND length(b) < 3 THEN 0.0D ELSE
        |  CAST(size(array_intersect(ga, gb)) AS DOUBLE) /
        |  nullif(size(ga) + size(gb) - size(array_intersect(ga, gb)), 0) END""".stripMargin
    def grams(c: String) =
      s"CASE WHEN length($c) < 3 THEN array() ELSE array_distinct(transform(" +
        s"sequence(1, length($c) - 2), i -> substring($c, i, 3))) END"
    val rows = pairs.toDF("a", "b")
      .withColumn("ga", expr(grams("a")))
      .withColumn("gb", expr(grams("b")))
      .withColumn("native", expr("trigram_similarity(a, b)"))
      .withColumn("hof", coalesce(expr(hof), lit(0.0)))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("native")) == r.getDouble(r.fieldIndex("hof")),
        s"'${r.getString(0)}' vs '${r.getString(1)}'")
    }
  }

  test("bigram_jaccard matches the HOF form on random word arrays") {
    val arrGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, wordGen))
    val pairs = samples(Gen.zip(arrGen, arrGen), 80, 42L)
    val hofJac =
      """CASE WHEN size(ga) = 0 OR size(gb) = 0 THEN 0.0D ELSE
        |  CAST(size(array_intersect(ga, gb)) AS DOUBLE) /
        |  (size(ga) + size(gb) - size(array_intersect(ga, gb))) END""".stripMargin
    def grams(c: String) =
      s"CASE WHEN size($c) < 2 THEN array() ELSE array_distinct(transform(" +
        s"sequence(1, size($c) - 1), i -> concat($c[i - 1], ' ', $c[i]))) END"
    val rows = pairs.toDF("a", "b")
      .withColumn("ga", expr(grams("a")))
      .withColumn("gb", expr(grams("b")))
      .withColumn("native", expr("bigram_jaccard(a, b)"))
      .withColumn("hof", expr(hofJac))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("native")) == r.getDouble(r.fieldIndex("hof")),
        s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("min_gram_hash matches the SQL md5 composition on random text") {
    val texts = samples(textGen, 60, 7L)
    val sqlForm =
      "array_min(transform(sequence(1, greatest(length(s) - 7, 1)), " +
        "i -> CAST(conv(substring(md5(concat('7:', substring(s, i, 8))), 1, 15), 16, 10) AS BIGINT)))"
    val rows = texts.toDF("s")
      .withColumn("native", expr("min_gram_hash(s, 7, 8)"))
      .withColumn("sql", expr(sqlForm))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"'${r.getString(0)}'"))
  }

  test("argmax-by-min-struct matches the row_number window on random counts") {
    // q15/q23 replaced constant-key row_number windows with
    // min/max(struct(...)) aggregates; the replacement is only sound if
    // the lexicographic struct order reproduces (cnt desc, user asc)
    // EXACTLY, ties included. Random multisets force tie cases.
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1L, 5L),
      Gen.choose(1L, 4L))
    val rows = samples(rowGen, 120, 23L)
    val counts = rows.toDF("typ", "user", "n")
      .groupBy("typ", "user").agg(sum("n").as("cnt"))
    val viaAgg = counts.groupBy("typ")
      .agg(min(struct((-col("cnt")).as("neg"), col("user"), col("cnt"))).as("m"))
      .select(col("typ"), col("m.user").as("user"), col("m.cnt").as("cnt"))
      .orderBy("typ").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("typ").orderBy(col("cnt").desc, col("user").asc)
    val viaWindow = counts
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("typ", "user", "cnt")
      .orderBy("typ").collect().toSeq
    assert(viaAgg === viaWindow)
  }

  test("claim_pcts matches the regexp_extract_all composition on adversarial text") {
    // Fragment soup engineered for the scanner's restart logic: digit runs
    // abutting commas, partial 'Prozent' prefixes, chained '1,2,3 %',
    // tabs/newlines as \s, multi-byte neighbors, and plain prose.
    val fragGen = Gen.oneOf(
      "62,5 %", "62,5%", "7,25 Prozent", "1,2,3 %", "12,34,5 %",
      "5,5 Proz", "9,9Prozent", "100,0\t%", "3,3\nProzent", "0,0 %",
      ", %", "42", "x,", "99,", ",5 %", "große 33,3 % Überzahl",
      "東京 12,1 % test", "n = 6.063", "Prozent", "%", "a1,1b2,2 %",
      "12 , 5 %", "00,00 %", "123456,789 %")
    val sentGen = Gen.choose(0, 6)
      .flatMap(n => Gen.listOfN(n, fragGen)).map(_.mkString(" "))
    val sents = samples(sentGen, 150, 20260813L)
    val pctRe = "(\\\\d+),(\\\\d+)\\\\s*(?:%|Prozent)"
    val rows = sents.toDF("sentence")
      .withColumn("native", expr("claim_pcts(sentence)"))
      .withColumn("sql", expr(
        s"transform(regexp_extract_all(sentence, '$pctRe', 0), " +
          "m -> CAST(split(m, ',')[0] AS DOUBLE) + " +
          "CAST(split(split(m, ',')[1], '[^0-9]+')[0] AS DOUBLE) / 10)"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"'${r.getString(0)}': native=${r.getSeq[Double](1)} sql=${r.getSeq[Double](2)}")
    }
  }

  test("trigram_set + trigram_sim_sorted equals fused trigram_similarity on random text") {
    val pairs = samples(Gen.zip(textGen, textGen), 100, 99L)
    val rows = pairs.toDF("a", "b")
      .withColumn("fused", expr("trigram_similarity(a, b)"))
      .withColumn("split", expr("trigram_sim_sorted(trigram_set(a), trigram_set(b))"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"'${r.getString(0)}' vs '${r.getString(1)}'")
    }
  }

  test("vec_dot matches the aggregate/zip_with fold incl. null and length edges") {
    val vGen: Gen[Seq[Option[Double]]] = Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(-5.0, 5.0).map(Some(_)),
        1 -> Gen.const(Option.empty[Double]))))
    val pairs = samples(Gen.zip(vGen, vGen), 120, 7L)
    val rows = pairs.toDF("a", "b")
      .withColumn("native", expr("vec_dot(a, b)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .collect()
    rows.foreach { r =>
      val native = if (r.isNullAt(2)) null else r.getDouble(2)
      val hof = if (r.isNullAt(3)) null else r.getDouble(3)
      assert(native == hof, s"${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
    }
  }

  test("sparse_cosine matches cosineSparse on random sparse vectors") {
    val vecGen: Gen[Map[String, Double]] = Gen.choose(0, 6)
      .flatMap(n => Gen.listOfN(n, Gen.zip(wordGen, Gen.oneOf(1.0, 2.0, 3.0))))
      .map(_.toMap)
    val pairs = samples(Gen.zip(vecGen, vecGen), 80, 9L)
    val df = pairs.map { case (a, b) =>
      (a.toSeq.sortBy(_._1), b.toSeq.sortBy(_._1),
        graft.operators.Clustering.cosineSparse(a, b))
    }.toDF("a", "b", "expected")
      .withColumn("native", expr("sparse_cosine(a, b)"))
      .collect()
    df.foreach { r =>
      assert(r.getDouble(r.fieldIndex("native")) == r.getDouble(r.fieldIndex("expected")))
    }
  }

  test("stance_pct matches from_json on random well-formed flat objects") {
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val stanceGen: Gen[String] = Gen.oneOf(
      "dafür", "dagegen", "support", "oppose", "neutral", "", "mixed case",
      "tab\\tin", "quote\\\"q", "uni\\u00e4", "東京", "back\\\\slash")
    val pctGen: Gen[String] = Gen.oneOf(
      "0", "42", "-7", "100.5", "0.0", "1e2", "2.5E-1", "-0.75", "98")
    // random key order, optional extra key, varied whitespace
    val payloadGen: Gen[String] = for {
      s <- stanceGen; p <- pctGen
      order <- Gen.oneOf(true, false)
      extra <- Gen.oneOf("", ", \"note\": [1, {\"deep\": \"}\"}]")
      pad <- Gen.oneOf("", " ", "\n ")
    } yield {
      val a = s"""\"stance\":$pad\"$s\""""
      val b = s"""\"pct\":$pad$p"""
      s"{${if (order) s"$a, $b" else s"$b, $a"}$extra}"
    }
    val payloads = samples(payloadGen, 120, 23L)
    val schema = StructType(Seq(
      StructField("stance", StringType), StructField("pct", DoubleType)))
    val rows = payloads.toDF("j")
      .select(col("j"), expr("stance_pct(j)").as("native"),
        from_json(col("j"), schema).as("jackson"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"payload: ${r.getString(0)}")
    }
  }

  test("token_counts matches the split/explode/count composition on random text") {
    val wsGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "", "\f", "\r")
    val messyGen: Gen[String] = for {
      n <- Gen.choose(0, 10)
      ws <- Gen.listOfN(n + 1, wsGen)
      words <- Gen.listOfN(n, wordGen)
      lead <- Gen.oneOf("", " ", "\t", "  \n")
      tail <- Gen.oneOf("", " ", "\r", "\n  ")
    } yield lead + words.zip(ws).map { case (w, s) => w + s }.mkString + tail
    val texts = samples(messyGen, 100, 31L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val a = df.select(col("id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val b = df.select(col("id"), explode(expr("token_counts(text)")).as(Seq("w", "n")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
