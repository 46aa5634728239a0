package graft

import graft.sources.Soep

/** Fixture-parity cases for the SOEP summary+detail merge
  * (connectors/soep_connector.py:261-352 precedence rules). */
class SoepSpec extends SparkSpec {
  import spark.implicits._

  private val summaries = Seq(
    // full record: detail exists and overrides title/subtitle/source
    """{"id": 1, "slug": "einkommen", "title": "Einkommen (kurz)",
      | "subtitle": "s-sub", "short_description": "Kurzbeschreibung",
      | "topics": [{"name": "Arbeit"}], "unit": "EUR",
      | "source": "SOEP v38", "last_updated_at": "2024-01-01"}""".stripMargin,
    // no matching detail: summary fallbacks everywhere
    """{"id": 2, "slug": "wohnen", "title": "Wohnen",
      | "short_description": "Mieten", "unit": "%",
      | "source": "SOEP v38", "last_updated_at": "2023-06-01"}""".stripMargin,
    // no slug: skipped (fetch_metadata:139-143)
    """{"id": 3, "title": "ohne slug"}""")
    .toDF("payload")

  private val details = Seq(
    """{"slug": "einkommen", "title": "Reales Haushaltseinkommen",
      | "long_description_html": "<p>lang</p>",
      | "topics": [{"title": "Einkommen"}, {"title": "Ungleichheit"}],
      | "dimensions": [
      |   {"dimension": "bundesland", "categories": ["BY", "BE"]},
      |   {"name": "geschlecht", "categories": ["m", "w"]},
      |   {"categories": ["dropped-no-key"]}],
      | "unit": {"label": "EUR", "description": "preisbereinigt"},
      | "methodology": "gewichtet", "available_years": [2019, 2020],
      | "last_updated_at": "2024-03-01"}""".stripMargin)
    .toDF("payload")

  private lazy val out =
    Soep.mergeMetadata(summaries, details).orderBy("slug").collect()

  test("summaries without slug are skipped; one row per kept summary") {
    assert(out.map(_.getAs[String]("slug")).toSeq == Seq("einkommen", "wohnen"))
  }

  test("field precedence: detail-first title/source, summary-first id/short_description") {
    val r = out(0)
    assert(r.getAs[Long]("id") == 1L)
    assert(r.getAs[String]("title") == "Reales Haushaltseinkommen")
    assert(r.getAs[String]("subtitle") == "s-sub") // detail has none
    assert(r.getAs[String]("short_description") == "Kurzbeschreibung")
    assert(r.getAs[String]("long_description_html") == "<p>lang</p>")
    assert(r.getAs[String]("methodology") == "gewichtet")
    assert(r.getAs[String]("last_updated_at") == "2024-03-01")
  }

  test("topics normalize to titles; dimensions map keyed by dimension/name") {
    val r = out(0)
    assert(r.getAs[collection.Seq[String]]("topics").toSeq ==
      Seq("Einkommen", "Ungleichheit"))
    val dims = r.getAs[Map[String, collection.Seq[String]]]("dimensions")
    assert(dims.keySet == Set("bundesland", "geschlecht"))
    assert(dims("bundesland").toSeq == Seq("BY", "BE"))
  }

  test("unit: detail label (description) wins; summary string is the fallback") {
    assert(out(0).getAs[String]("unit") == "EUR (preisbereinigt)")
    assert(out(1).getAs[String]("unit") == "%")
  }

  test("missing detail: summary carries through, detail-only fields null/empty") {
    val r = out(1)
    assert(r.getAs[String]("title") == "Wohnen")
    assert(r.getAs[String]("long_description_html") == null)
    assert(r.getAs[collection.Seq[String]]("topics").isEmpty)
    assert(r.getAs[collection.Seq[Int]]("available_years").isEmpty)
  }
}
