package graft

import graft.sources.BundestagDip
import org.apache.spark.sql.functions._

/** Fixture-parity cases for the Bundestag DIP Drucksache→candidate parse
  * (study_scraper/discovery/bundestag_dip.py:163-217), mirroring
  * tests/study_scraper/test_bundestag_dip.py over dip_drucksache.json. */
class BundestagDipSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{"numFound": 3, "cursor": "abc",
      | "documents": [
      |  {"id": "300754", "dokumentart": "Drucksache", "drucksachetyp": "Antrag",
      |   "titel": "Klimaschutzgesetz konsequent umsetzen – Sektorziele wiederherstellen",
      |   "datum": "2025-11-12", "wahlperiode": 21,
      |   "urheber": [{"titel": "Fraktion BUENDNIS 90/DIE GRUENEN"}],
      |   "fundstelle": {"dokumentnummer": "21/4521", "herausgeber": "BT",
      |     "pdf_url": "https://dserver.bundestag.de/btd/21/045/2104521.pdf"},
      |   "vorgangsbezug": [{"id": "320011",
      |     "titel": "Klimaschutzgesetz konsequent umsetzen",
      |     "vorgangstyp": "Antrag"}]},
      |  {"id": "300901", "dokumentart": "Drucksache",
      |   "drucksachetyp": "Gesetzentwurf",
      |   "titel": "Entwurf eines Gesetzes zur Aenderung des Bundes-Klimaschutzgesetzes",
      |   "datum": "2026-03-05", "wahlperiode": 21,
      |   "urheber": [{"bezeichnung": "Bundesregierung"}, {"titel": ""}],
      |   "fundstelle": {"dokumentnummer": "21/5102", "herausgeber": "BT"}},
      |  {"id": "", "titel": "Kein Dokument"},
      |  {"id": "300999", "titel": "  "}
      |]}""".stripMargin

  private lazy val out = BundestagDip
    .candidates(Seq(payload).toDF("payload"), "payload", lit("klima"))
    .orderBy("doc_idx").collect()

  test("blank id or titel drops the document; source_id set") {
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("source_id") == "bundestag_dip"))
    assert(out.forall(_.getAs[String]("language") == "de"))
  }

  test("pdf_url wins canonical_url; missing pdf falls back to the DIP page") {
    assert(out(0).getAs[String]("external_id") == "300754")
    assert(out(0).getAs[String]("canonical_url") ==
      "https://dserver.bundestag.de/btd/21/045/2104521.pdf")
    assert(out(1).getAs[String]("canonical_url") ==
      "https://dip.bundestag.de/drucksache/300901")
  }

  test("publisher joins truthy urheber titles with bezeichnung fallback") {
    assert(out(0).getAs[String]("publisher") == "Fraktion BUENDNIS 90/DIE GRUENEN")
    // first urheber has only bezeichnung; second is blank and dropped
    assert(out(1).getAs[String]("publisher") == "Bundesregierung")
  }

  test("datum parses strictly as %Y-%m-%d") {
    assert(out(0).getAs[java.sql.Date]("publication_date").toString == "2025-11-12")
  }

  test("raw carries drucksache metadata and capped vorgangsbezug") {
    val raw = out(0).getAs[org.apache.spark.sql.Row]("raw")
    assert(raw.getAs[String]("drucksachetyp") == "Antrag")
    assert(raw.getAs[String]("dokumentnummer") == "21/4521")
    assert(raw.getAs[Int]("wahlperiode") == 21)
    assert(raw.getAs[String]("herausgeber") == "BT")
    val vb = raw.getAs[collection.Seq[org.apache.spark.sql.Row]]("vorgangsbezug")
    assert(vb.length == 1)
    assert(vb.head.getAs[String]("vorgangstyp") == "Antrag")
    // document without fundstelle.pdf_url → raw.pdf_url is null
    assert(out(1).getAs[org.apache.spark.sql.Row]("raw")
      .getAs[String]("pdf_url") == null)
  }

  test("no-urheber document still gets the Bundestag default publisher") {
    val p2 = """{"documents": [{"id": "1", "titel": "T", "datum": "junk"}]}"""
    val r = BundestagDip.candidates(Seq(p2).toDF("payload"), "payload").collect()(0)
    assert(r.getAs[String]("publisher") == "Deutscher Bundestag")
    assert(r.getAs[java.sql.Date]("publication_date") == null)
  }
}
