package graft

import graft.sources.Gesis

/** Fixture-parity cases for the GESIS SPARQL-JSON parsing
  * (connectors/gesis_connector.py:46-194). */
class GesisSpec extends SparkSpec {
  import spark.implicits._

  private val metaPayload =
    """{"results": {"bindings": [
      | {"p": {"value": "http://purl.org/dc/terms/title"},
      |  "o": {"value": "Erster Titel"}},
      | {"p": {"value": "https://schema.org/name#title"},
      |  "o": {"value": "Letzter Titel"}},
      | {"p": {"value": "http://purl.org/dc/terms/abstract"},
      |  "o": {"value": "Eine Beschreibung"}},
      | {"p": {"value": "https://schema.org/creator"},
      |  "o": {"value": "GESIS"}},
      | {"p": {"value": "http://purl.org/dc/terms/issued"},
      |  "o": {"value": "2020-01-01"}},
      | {"p": {"value": "https://schema.org/dateModified"},
      |  "o": {"value": "2024-05-01"}},
      | {"p": {"value": "https://schema.org/variableMeasured"},
      |  "o": {"value": "einkommen"}},
      | {"p": {"value": "https://schema.org/variableMeasured"},
      |  "o": {"value": "alter"}},
      | {"p": {"value": "https://schema.org/variableMeasured"},
      |  "o": {"value": "einkommen"}},
      | {"p": {"value": ""}, "o": {"value": "skipped"}}
      |]}}""".stripMargin

  private lazy val out = Gesis.datasetMetadata(Seq(
      ("https://data.gesis.org/d/ZA1234", metaPayload),
      ("https://data.gesis.org/d/ZA9999", "not json at all"))
      .toDF("resource_id", "payload"))
    .orderBy("id").collect()

  test("scalar fields map fuzzily with last-binding-wins overwrite") {
    val r = out(0)
    assert(r.getAs[String]("title") == "Letzter Titel")
    assert(r.getAs[String]("description") == "Eine Beschreibung")
    assert(r.getAs[String]("creator") == "GESIS")
    assert(r.getAs[String]("issued") == "2024-05-01") // dateModified overwrote
    assert(r.getAs[String]("status") == "success")
  }

  test("variables dedup in first-appearance order; properties keyed by short name") {
    val r = out(0)
    assert(r.getAs[collection.Seq[String]]("variables").toSeq ==
      Seq("einkommen", "alter"))
    val props = r.getAs[Map[String, String]]("properties")
    assert(props("title") == "Letzter Titel")
    assert(props("abstract") == "Eine Beschreibung")
    assert(!props.contains("")) // blank predicate skipped
  }

  test("unparseable payload yields the error record with the title fallback") {
    val r = out(1)
    assert(r.getAs[String]("status") == "error")
    assert(r.getAs[String]("title") == "Dataset ZA9999")
    assert(r.getAs[Map[String, String]]("properties").isEmpty)
  }

  test("dataset list result parses to URI rows") {
    val listPayload =
      """{"results": {"bindings": [
        | {"d": {"value": "https://data.gesis.org/d/ZA0001"}},
        | {"d": {"value": "https://data.gesis.org/d/ZA0002"}}]}}""".stripMargin
    val rows = Gesis.listDatasets(Seq(listPayload).toDF("payload"))
      .orderBy("id").collect()
    assert(rows.map(_.getAs[String]("id")).toSeq ==
      Seq("https://data.gesis.org/d/ZA0001", "https://data.gesis.org/d/ZA0002"))
    assert(rows.forall(_.getAs[String]("type") == "https://schema.org/Dataset"))
  }
}
