package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.Row

/** German-numeric claim extraction regression cases —
  * tests/study_scraper/test_claims_german_pct.py and claims.py:136-176. */
class ClaimsSpec extends SparkSpec {
  import spark.implicits._

  private def claims(sentence: String): Seq[Row] =
    TextAnalysis.extractClaims(
      Seq((1L, sentence)).toDF("poll_id", "sentence"))
      .orderBy("claim_idx").collect().toSeq

  test("German decimal comma: 62,5 % → 62.5") {
    val r = claims("Zustimmung bei 62,5 % (n = 1002).")
    assert(r.length == 1)
    assert(r.head.getDouble(2) == 62.5)
    assert(r.head.getInt(3) == 1002)
  }

  test("Prozent unit variant parses the same") {
    val r = claims("Zustimmung bei 30,0 Prozent.")
    assert(r.length == 1 && r.head.getDouble(2) == 30.0)
  }

  test("thousands dot in sample size: n = 6.063 → 6063") {
    val r = claims("Es stimmten 55,1 % zu (n = 6.063).")
    assert(r.head.getInt(3) == 6063)
  }

  test(">120% suppression keeps later claims and their indices") {
    val r = claims("Erst 130,0 %, dann 45,5 Prozent.")
    assert(r.length == 1)
    assert(r.head.getInt(1) == 1) // claim_idx 1 — the gap survives
    assert(r.head.getDouble(2) == 45.5)
  }

  test("exactly 120,0 is kept (boundary is exclusive above)") {
    val r = claims("Genau 120,0 %.")
    assert(r.length == 1 && r.head.getDouble(2) == 120.0)
  }

  test("no numbers → no claims") {
    assert(claims("Studie ohne Zahlen.").isEmpty)
  }

  test("multiple claims in order") {
    val r = claims("Zustimmung 40,5 %, Ablehnung 35,0 Prozent, Rest 24,5 %.")
    assert(r.map(_.getDouble(2)) == Seq(40.5, 35.0, 24.5))
    assert(r.map(_.getInt(1)) == Seq(0, 1, 2))
  }

  test("missing sample size → null") {
    val r = claims("Nur 12,0 % hier.")
    assert(r.head.isNullAt(3))
  }
}
