package graft

import graft.sources.GovData

/** Fixture-parity cases for the GovData CKAN lake source
  * (study_scraper/sources/govdata.py, mirrored from
  * tests/study_scraper/test_govdata.py and fixtures/govdata/sample.json). */
class GovDataSpec extends SparkSpec {
  import spark.implicits._

  // Condensed fixtures/govdata/sample.json: Destatis dataset with a full
  // license block, UBA dataset with CC0, and the municipal dataset with
  // no license fields (exercises the default fallback).
  private val fixture =
    """{"help": "https://www.govdata.de/ckan/api/3/action/help_show",
      | "success": true,
      | "result": {"count": 3, "results": [
      |  {"id": "8f2b6f1a-1111-4a11-9a11-111111111111",
      |   "name": "steueraufkommen-nach-steuerart-2024",
      |   "title": "Steueraufkommen nach Steuerart 2024",
      |   "notes": "Steueraufkommen nach Steuerart.",
      |   "license_id": "dl-de-by-2.0",
      |   "license_title": "Datenlizenz Deutschland – Namensnennung – Version 2.0",
      |   "license_url": "https://www.govdata.de/dl-de/by-2-0",
      |   "metadata_created": "2024-03-01T00:00:00",
      |   "metadata_modified": "2024-03-15T09:12:00",
      |   "organization": {"name": "statistisches-bundesamt",
      |                    "title": "Statistisches Bundesamt (Destatis)"},
      |   "tags": [{"name": "Steuern"}, {"name": "Erbschaftsteuer"}],
      |   "resources": [{"url": "https://www.destatis.de/govdata/steueraufkommen-2024.csv",
      |                  "format": "CSV", "name": "Steueraufkommen 2024 (CSV)"}],
      |   "extras": [{"key": "geographic_coverage", "value": "DE"}]},
      |  {"id": "8f2b6f1a-2222-4a11-9a11-222222222222",
      |   "name": "co2-emissionen-bundeslaender-2023",
      |   "title": "CO2-Emissionen nach Bundesländern 2023",
      |   "license_id": "cc-zero",
      |   "license_title": "Creative Commons CC Zero (CC0)",
      |   "organization": {"name": "umweltbundesamt",
      |                    "title": "Umweltbundesamt (UBA)"},
      |   "tags": [{"name": "Klimaschutz"}],
      |   "resources": [{"url": "https://www.umweltbundesamt.de/govdata/co2-2023.xlsx",
      |                  "format": "XLSX", "name": "CO2 2023"}],
      |   "extras": []},
      |  {"id": "8f2b6f1a-3333-4a11-9a11-333333333333",
      |   "name": "kommunale-haushaltsdaten-musterstadt",
      |   "title": "Kommunale Haushaltsdaten Musterstadt",
      |   "organization": {"name": "stadt-musterstadt",
      |                    "title": "Stadt Musterstadt"},
      |   "tags": [{"name": "Haushalt"}],
      |   "resources": [{"url": "https://www.musterstadt.de/govdata/haushalt-2022.csv",
      |                  "format": "CSV", "name": "Haushalt 2022 (CSV)"}],
      |   "extras": []},
      |  {"name": "  "},
      |  {"id": null, "name": "nur-name-vorhanden", "title": "Nur Name"}
      |]}}""".stripMargin

  private lazy val out = GovData.records(Seq(fixture).toDF("payload"))
    .orderBy("source_record_id").collect()

  test("yields one record per dataset; blank-id datasets skipped") {
    // 3 real + the name-only dataset (id falls back to name); the
    // blank-everything entry is skipped (test_yields_one_record_per_dataset)
    assert(out.length == 4)
  }

  test("canonical url uses dataset name; id is the record id") {
    val destatis = out.find(_.getAs[String]("source_record_id")
      .endsWith("111111111111")).get
    assert(destatis.getAs[String]("canonical_url") ==
      "https://www.govdata.de/dataset/steueraufkommen-nach-steuerart-2024")
    // id fallback: record with null id keys by name
    assert(out.exists(_.getAs[String]("source_record_id") == "nur-name-vorhanden"))
  }

  test("license captured per record, not hardcoded; default fallback") {
    def lic(tail: String) = out.find(_.getAs[String]("source_record_id")
      .endsWith(tail)).get.getAs[String]("license")
    assert(lic("111111111111") ==
      "Datenlizenz Deutschland – Namensnennung – Version 2.0")
    assert(lic("222222222222") == "Creative Commons CC Zero (CC0)")
    // test_record_with_no_license_falls_back_to_default
    assert(lic("333333333333") == GovData.defaultLicense)
  }

  test("payload preserves full dataset incl. resources and tags") {
    val destatis = out.find(_.getAs[String]("source_record_id")
      .endsWith("111111111111")).get
    val payload = destatis.getAs[org.apache.spark.sql.Row]("payload")
    val resources = payload.getAs[collection.Seq[org.apache.spark.sql.Row]]("resources")
    assert(resources.head.getAs[String]("url")
      == "https://www.destatis.de/govdata/steueraufkommen-2024.csv")
    val tags = payload.getAs[collection.Seq[org.apache.spark.sql.Row]]("tags")
    assert(tags.map(_.getAs[String]("name")) == Seq("Steuern", "Erbschaftsteuer"))
  }

  test("publisher hint from organization title") {
    val destatis = out.find(_.getAs[String]("source_record_id")
      .endsWith("111111111111")).get
    assert(destatis.getAs[String]("publisher_hint") ==
      "Statistisches Bundesamt (Destatis)")
  }

  test("content hash deterministic; format and content type constants") {
    val again = GovData.records(Seq(fixture).toDF("payload"))
      .orderBy("source_record_id").collect()
    assert(out.map(_.getAs[String]("content_hash")).toSeq ==
      again.map(_.getAs[String]("content_hash")).toSeq)
    assert(out.forall(_.getAs[String]("format") == "govdata_ckan_package"))
    assert(out.forall(_.getAs[String]("content_type") == "application/json"))
  }

  test("topic query terms: include_keywords only, de-first, deduped, capped") {
    val terms = GovData.topicQueryTerms(Seq(
      "en" -> Seq("inheritance tax", "Erbschaftssteuer"),
      "de" -> Seq("Erbschaftssteuer", "Vermögensteuer", " erbschaftssteuer ")))
    // de locale first (test_german_locale_first), case-insensitive dedup
    assert(terms == Seq("Erbschaftssteuer", "Vermögensteuer", "inheritance tax"))
    // caps at max terms (test_caps_at_max_terms)
    val many = GovData.topicQueryTerms(
      Seq("de" -> (1 to 10).map(i => s"t$i")), maxTerms = 6)
    assert(many.length == 6)
  }
}
