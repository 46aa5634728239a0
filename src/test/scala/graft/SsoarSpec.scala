package graft

import graft.sources.Ssoar

/** Fixture-parity test for the SSOAR OAI-PMH parser — the same envelope
  * shape as tests/study_scraper/fixtures/ssoar/klima_records.xml and the
  * parser rules of discovery/ssoar.py (deleted skip, title/url
  * requirements, year-only dates, deu→de, DOI pull-out). */
class SsoarSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
      |  <responseDate>2026-05-24T12:00:00Z</responseDate>
      |  <request verb="ListRecords">https://example.org/oai</request>
      |  <ListRecords>
      |    <record>
      |      <header>
      |        <identifier>oai:example:document/101</identifier>
      |        <datestamp>2005-12-01</datestamp>
      |      </header>
      |      <metadata>
      |        <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                   xmlns:dc="http://purl.org/dc/elements/1.1/">
      |          <dc:title>Kommunale Studie Alpha</dc:title>
      |          <dc:creator>Erste, Autorin</dc:creator>
      |          <dc:creator>Zweiter, Autor</dc:creator>
      |          <dc:subject>Klimaschutz</dc:subject>
      |          <dc:subject>Kommunalpolitik</dc:subject>
      |          <dc:description>Absatz eins.</dc:description>
      |          <dc:description>Absatz zwei.</dc:description>
      |          <dc:publisher>Testzentrum Berlin</dc:publisher>
      |          <dc:date>2005</dc:date>
      |          <dc:type>doc-type:report</dc:type>
      |          <dc:identifier>urn:nbn:de:0000-101</dc:identifier>
      |          <dc:identifier>https://www.example.org/handle/document/101</dc:identifier>
      |          <dc:language>deu</dc:language>
      |          <dc:rights>Deposit Licence</dc:rights>
      |        </oai_dc:dc>
      |      </metadata>
      |    </record>
      |    <record>
      |      <header status="deleted">
      |        <identifier>oai:example:document/102</identifier>
      |        <datestamp>2010-01-01</datestamp>
      |      </header>
      |    </record>
      |    <record>
      |      <header>
      |        <identifier>oai:example:document/103</identifier>
      |        <datestamp>2016-06-01</datestamp>
      |      </header>
      |      <metadata>
      |        <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                   xmlns:dc="http://purl.org/dc/elements/1.1/">
      |          <dc:title>Studie Beta mit DOI</dc:title>
      |          <dc:creator>Dritte, Person</dc:creator>
      |          <dc:date>2016-03</dc:date>
      |          <dc:identifier>https://www.example.org/handle/document/103</dc:identifier>
      |          <dc:identifier>https://doi.org/10.1515/test-103</dc:identifier>
      |          <dc:language>eng</dc:language>
      |        </oai_dc:dc>
      |      </metadata>
      |    </record>
      |    <record>
      |      <header>
      |        <identifier>oai:example:document/104</identifier>
      |        <datestamp>2020-01-01</datestamp>
      |      </header>
      |      <metadata>
      |        <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                   xmlns:dc="http://purl.org/dc/elements/1.1/">
      |          <dc:identifier>https://www.example.org/handle/document/104</dc:identifier>
      |        </oai_dc:dc>
      |      </metadata>
      |    </record>
      |    <resumptionToken>token-abc123</resumptionToken>
      |  </ListRecords>
      |</OAI-PMH>""".stripMargin

  private lazy val out =
    Ssoar.candidates(Seq(fixture).toDF("payload"), "klima")
      .orderBy("external_id").collect()

  test("parses kept records; deleted and title-less records are skipped") {
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("external_id")).toSeq ==
      Seq("oai:example:document/101", "oai:example:document/103"))
  }

  test("full record: title, authors, publisher, subjects, abstract join") {
    val r = out(0)
    assert(r.getAs[String]("title") == "Kommunale Studie Alpha")
    assert(r.getAs[collection.Seq[String]]("authors").toSeq ==
      Seq("Erste, Autorin", "Zweiter, Autor"))
    assert(r.getAs[String]("publisher") == "Testzentrum Berlin")
    assert(r.getAs[collection.Seq[String]]("subjects").contains("Klimaschutz"))
    assert(r.getAs[String]("abstract") == "Absatz eins.\nAbsatz zwei.")
    assert(r.getAs[String]("discovery_query") == "klima")
  }

  test("canonical url = first http identifier; year-only date parses") {
    val r = out(0)
    assert(r.getAs[String]("canonical_url") ==
      "https://www.example.org/handle/document/101")
    assert(r.getAs[java.sql.Date]("publication_date").toString == "2005-01-01")
    assert(r.getAs[String]("doi") == null)
  }

  test("language normalizes deu→de / eng→en; DOI pulled from identifiers") {
    assert(out(0).getAs[String]("language") == "de")
    val beta = out(1)
    assert(beta.getAs[String]("language") == "en")
    assert(beta.getAs[String]("doi") == "https://doi.org/10.1515/test-103")
    assert(beta.getAs[java.sql.Date]("publication_date").toString == "2016-03-01")
  }

  test("resumption token surfaces for the live path's pagination") {
    val tok = Ssoar.resumptionToken(Seq(fixture).toDF("payload")).collect()
    assert(tok.head.getString(0) == "token-abc123")
  }
}
