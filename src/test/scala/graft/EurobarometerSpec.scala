package graft

import graft.sources.Eurobarometer

/** Fixture-parity cases for the Eurobarometer lake source
  * (study_scraper/sources/eurobarometer.py, mirrored from
  * tests/study_scraper/test_eurobarometer.py and
  * fixtures/eurobarometer/sample.json). */
class EurobarometerSpec extends SparkSpec {
  import spark.implicits._

  // Condensed fixture: the climate wave (full triple set incl. license +
  // DOI), a second wave, and the negative control without a license
  // triple — same ids as fixtures/eurobarometer/sample.json.
  private val fixture =
    """{"datasets": [
      | {"uri": "https://data.gesis.org/datasearchkg/Dataset/10.4232/1.90001",
      |  "triples": [
      |   {"p": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      |    "o": "https://schema.org/Dataset", "type": "uri"},
      |   {"p": "https://schema.org/name",
      |    "o": "Special Eurobarometer: Climate Change",
      |    "type": "literal", "lang": "en"},
      |   {"p": "https://schema.org/description",
      |    "o": "EU-wide survey on climate change.", "type": "literal"},
      |   {"p": "https://schema.org/identifier",
      |    "o": "https://doi.org/10.4232/1.90001", "type": "uri"},
      |   {"p": "https://schema.org/keywords", "o": "Klimaschutz", "type": "literal"},
      |   {"p": "https://schema.org/keywords", "o": "Eurobarometer", "type": "literal"},
      |   {"p": "https://schema.org/license",
      |    "o": "https://www.gesis.org/en/services/data-analysis", "type": "uri"}
      |  ]},
      | {"uri": "https://data.gesis.org/datasearchkg/Dataset/10.4232/1.90002",
      |  "triples": [
      |   {"p": "https://schema.org/name",
      |    "o": "Standard Eurobarometer 100 (Autumn 2023)", "type": "literal"},
      |   {"p": "https://schema.org/identifier",
      |    "o": "https://doi.org/10.4232/1.90002", "type": "uri"}
      |  ]},
      | {"uri": "https://data.gesis.org/datasearchkg/Dataset/10.4232/1.90003",
      |  "triples": [
      |   {"p": "https://schema.org/name",
      |    "o": "Standard Eurobarometer 99 -- Digital Rights", "type": "literal"},
      |   {"p": "https://schema.org/identifier",
      |    "o": "https://doi.org/10.4232/1.90003", "type": "uri"}
      |  ]},
      | {"uri": "", "triples": [{"p": "x", "o": "y", "type": "literal"}]},
      | {"uri": "https://data.gesis.org/d/empty", "triples": []}
      |]}""".stripMargin

  private lazy val out =
    Eurobarometer.records(Seq(fixture).toDF("payload"))
      .orderBy("canonical_url").collect()

  test("yields one record per dataset uri; blank uri / empty triples skipped") {
    assert(out.length == 3) // test_yields_one_record_per_dataset_uri
    assert(out.map(_.getAs[String]("canonical_url")).contains(
      "https://data.gesis.org/datasearchkg/Dataset/10.4232/1.90001"))
  }

  test("source_record_id is the last uri segment") {
    // test_source_record_id_is_last_uri_segment: .../10.4232/1.90001 → 1.90001
    assert(out(0).getAs[String]("source_record_id") == "1.90001")
  }

  test("doi extracted from schema:identifier doi.org url") {
    assert(out(0).getAs[String]("doi") == "10.4232/1.90001")
  }

  test("title hint propagated; license captured; default license fallback") {
    assert(out(0).getAs[String]("title_hint").contains("Eurobarometer"))
    assert(out(0).getAs[String]("license").contains("gesis.org"))
    // test_record_with_no_license_falls_back_to_default
    assert(out(2).getAs[String]("license") == Eurobarometer.defaultLicense)
  }

  test("payload preserves all triples sorted by (p, o)") {
    val r = out(0)
    val triples = r.getAs[org.apache.spark.sql.Row]("payload")
      .getAs[collection.Seq[org.apache.spark.sql.Row]]("triples")
    assert(triples.length == 7) // test_payload_preserves_all_triples
    val keys = triples.map(t =>
      (t.getAs[String]("p"), t.getAs[String]("o")))
    assert(keys == keys.sortBy(identity)) // sorted_again == triples
    // keywords: "Eurobarometer" sorts before "Klimaschutz" under same p
    val kw = triples.filter(_.getAs[String]("p") == "https://schema.org/keywords")
      .map(_.getAs[String]("o"))
    assert(kw == Seq("Eurobarometer", "Klimaschutz"))
  }

  test("content hash deterministic and 64 hex chars") {
    val again = Eurobarometer.records(Seq(fixture).toDF("payload"))
      .orderBy("canonical_url").collect()
    assert(out.map(_.getAs[String]("content_hash")).toSeq ==
      again.map(_.getAs[String]("content_hash")).toSeq)
    assert(out.forall(_.getAs[String]("content_hash").matches("[0-9a-f]{64}")))
  }

  test("record format and content type constants") {
    assert(out.forall(_.getAs[String]("format") == "eurobarometer_kg_sparql_json"))
    assert(out.forall(_.getAs[String]("content_type") ==
      "application/sparql-results+json"))
  }

  test("helper parity: record id extraction and doi variants") {
    // test_extract_source_record_id_typical + doi prefix/bare forms
    val rows = Eurobarometer.records(Seq(
      """{"datasets": [
        | {"uri": "https://data.gesis.org/gesiskg/resource/ZA9001",
        |  "triples": [{"p": "http://purl.org/dc/terms/identifier",
        |               "o": "doi:10.1234/zz91", "type": "literal"}]},
        | {"uri": "https://x.org/frag#piece",
        |  "triples": [{"p": "https://schema.org/hasDoiRef",
        |               "o": "10.5555/abc", "type": "literal"}]},
        | {"uri": "https://x.org/nodoi",
        |  "triples": [{"p": "https://schema.org/name", "o": "t",
        |               "type": "literal"}]}
        |]}""".stripMargin).toDF("payload"))
      .orderBy("canonical_url").collect()
    val byUrl = rows.map(r => r.getAs[String]("canonical_url") -> r).toMap
    assert(byUrl("https://data.gesis.org/gesiskg/resource/ZA9001")
      .getAs[String]("source_record_id") == "ZA9001")
    assert(byUrl("https://data.gesis.org/gesiskg/resource/ZA9001")
      .getAs[String]("doi") == "10.1234/zz91")
    assert(byUrl("https://x.org/frag#piece")
      .getAs[String]("source_record_id") == "piece")
    assert(byUrl("https://x.org/frag#piece").getAs[String]("doi") == "10.5555/abc")
    assert(byUrl("https://x.org/nodoi").getAs[String]("doi") == null)
  }
}
