package graft

import graft.operators.{Merge, Topics}
import org.apache.spark.sql.functions._

/** Ported reference cases for the auto-reviewer policy
  * (tests/study_scraper/test_auto_review.py) and the DOI normalizer
  * (study_scraper/pipeline.py:115-131 docstring forms). */
class AutoReviewSpec extends SparkSpec {
  import spark.implicits._

  private val goodAbstract =
    "Eine repräsentative Umfrage unter 1000 Befragten zum Klimaschutz."

  private def decide(title: String, abstract_ : String,
                     claims: Int, score: java.lang.Double): (String, String) = {
    val df = Seq((title, abstract_, claims, Option(score).map(_.doubleValue)))
      .toDF("title", "abstract", "claims_count", "max_score")
    val (d, r) = Topics.autoReviewDecide(
      col("title"), col("abstract"), col("claims_count"), col("max_score"))
    val row = df.select(d.as("d"), r.as("r")).head()
    (row.getString(0), row.getString(1))
  }

  test("claims present is kept") {
    val (d, why) = decide("Klima", goodAbstract, 3, 0.05)
    assert(d == "kept" && why.contains("claim"))
  }

  test("near-threshold score is kept") {
    assert(decide("Klima", goodAbstract, 0, 0.15)._1 == "kept")
  }

  test("borderline with text defaults to kept") {
    val (d, why) = decide("Eine Studie", goodAbstract, 0, 0.07)
    assert(d == "kept" && why.contains("coverage-first"))
  }

  test("noise is rejected") {
    val (d, why) = decide("x", "", 0, 0.02)
    assert(d == "rejected" && why.contains("noise"))
  }

  test("never returns pending; null score handled as 0.0") {
    val cases: Seq[(Int, java.lang.Double, String)] = Seq(
      (0, Double.box(0.0), ""), (0, Double.box(0.19), goodAbstract),
      (5, Double.box(0.0), "x"), (0, null, goodAbstract))
    for ((cc, sc, ab) <- cases)
      assert(Set("kept", "rejected").contains(decide("t", ab, cc, sc)._1))
  }

  test("DOI normalizer strips every surface form, preserves case, nulls blanks") {
    val forms = Seq(
      "https://doi.org/10.1515/pwp-2023-0031",
      "http://doi.org/10.1515/pwp-2023-0031",
      "doi:10.1515/pwp-2023-0031",
      "10.1515/pwp-2023-0031",
      "  10.1515/pwp-2023-0031  ",
      "DOI:10.1515/pwp-2023-0031",
      "HTTPS://DOI.ORG/10.1515/PWP",
      "", "   ")
    val out = forms.toDF("raw")
      .select(Merge.normalizeDoi(col("raw")).as("doi"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.take(6).forall(_.contains("10.1515/pwp-2023-0031")))
    assert(out(6).contains("10.1515/PWP")) // case of remainder preserved
    assert(out(7).isEmpty && out(8).isEmpty)
  }
}
