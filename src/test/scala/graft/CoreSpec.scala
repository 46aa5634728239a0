package graft

import graft.sources.Core
import org.apache.spark.sql.functions._

/** Fixture-parity cases for the CORE search work→candidate parse
  * (study_scraper/discovery/core_search.py:151-290), mirroring
  * tests/study_scraper/test_core_search.py over its core_search.json
  * fixture shapes. */
class CoreSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{"totalHits": 3, "limit": 25, "offset": 0,
      | "results": [
      |  {"id": 266729884,
      |   "title": "Oekosystembasierte Klimapolitik fuer Deutschland",
      |   "abstract": "  Die Leistungen der Natur.  ",
      |   "authors": [{"name": "Roeder, Norbert"},
      |               {"name": "Schroeter-Schlaack, Christoph"}, {"name": " "}],
      |   "doi": "10.1007/978-3-658-05578-3_12",
      |   "documentType": "chapter",
      |   "downloadUrl": "",
      |   "language": {"code": "de", "name": "German"},
      |   "publisher": "",
      |   "publishedDate": "2016-10-24T01:00:00+01:00",
      |   "yearPublished": 2016,
      |   "dataProviders": [{"id": 984, "name": "EconStor (ZBW Kiel)"}],
      |   "links": [{"type": "display", "url": "https://core.ac.uk/works/266729884"}]},
      |  {"id": 553024823,
      |   "title": "Klimapolitik trotzt Trump",
      |   "doi": null,
      |   "downloadUrl": "https://core.ac.uk/download/553024823.pdf",
      |   "language": null,
      |   "publishedDate": "2017-06-01",
      |   "yearPublished": 2017},
      |  {"id": 158306103,
      |   "title": "Klimagerechtigkeit",
      |   "doi": null,
      |   "downloadUrl": "",
      |   "language": {"code": "", "name": ""},
      |   "publishedDate": "2015-01-01T00:00:00",
      |   "yearPublished": 2015},
      |  {"id": 9, "title": "   "}
      |]}""".stripMargin

  private lazy val out = Core
    .candidates(Seq(payload).toDF("payload"), "payload", lit("klima"))
    .orderBy("work_idx").collect()

  test("three candidates parse; blank title drops; source_id is core") {
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("source_id") == "core"))
  }

  test("bare DOI becomes a doi.org canonical_url; doi field stays bare") {
    assert(out(0).getAs[String]("canonical_url") ==
      "https://doi.org/10.1007/978-3-658-05578-3_12")
    assert(out(0).getAs[String]("doi") == "10.1007/978-3-658-05578-3_12")
    assert(out(0).getAs[String]("external_id") == "266729884")
  }

  test("no DOI falls back to downloadUrl, then the display/work-page link") {
    assert(out(1).getAs[String]("canonical_url") ==
      "https://core.ac.uk/download/553024823.pdf")
    // no doi, no downloadUrl, no links → synthesized work page
    assert(out(2).getAs[String]("canonical_url") ==
      "https://core.ac.uk/works/158306103")
  }

  test("offset datetime keeps its literal date; bare date parses; naive datetime falls to year") {
    assert(out(0).getAs[java.sql.Date]("publication_date").toString == "2016-10-24")
    assert(out(1).getAs[java.sql.Date]("publication_date").toString == "2017-06-01")
    // "2015-01-01T00:00:00" matches NEITHER strptime format → yearPublished
    assert(out(2).getAs[java.sql.Date]("publication_date").toString == "2015-01-01")
  }

  test("language code lowercases; missing or empty code is null") {
    assert(out(0).getAs[String]("language") == "de")
    assert(out(1).getAs[String]("language") == null)
    assert(out(2).getAs[String]("language") == null)
  }

  test("authors trim and drop blanks; abstract/publisher strip-or-null") {
    assert(out(0).getAs[collection.Seq[String]]("authors").toSeq ==
      Seq("Roeder, Norbert", "Schroeter-Schlaack, Christoph"))
    assert(out(0).getAs[String]("abstract") == "Die Leistungen der Natur.")
    assert(out(0).getAs[String]("publisher") == null) // "" → None
  }

  test("raw keeps core_id, document_type, data providers") {
    val raw = out(0).getAs[org.apache.spark.sql.Row]("raw")
    assert(raw.getAs[String]("core_id") == "266729884")
    assert(raw.getAs[String]("document_type") == "chapter")
    assert(raw.getAs[collection.Seq[String]]("data_providers").toSeq ==
      Seq("EconStor (ZBW Kiel)"))
    assert(raw.getAs[String]("download_url") == null) // "" → None
  }
}
