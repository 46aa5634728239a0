package graft

import graft.sources.OpenAlex
import org.apache.spark.sql.functions._

/** Fixture-parity cases for the OpenAlex work→candidate parse
  * (study_scraper/discovery/openalex.py:187-287, :328-340), mirroring the
  * reference's tests/study_scraper/test_openalex.py assertions. */
class OpenAlexSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{"meta": {"count": 4, "next_cursor": null},
      | "results": [
      |  {"id": "https://openalex.org/W4391234567",
      |   "doi": "https://doi.org/10.1515/pwp-2023-0031",
      |   "title": "CO2-Bepreisung in Deutschland",
      |   "display_name": "CO2-Bepreisung in Deutschland",
      |   "publication_year": 2023,
      |   "publication_date": "2023-12-01",
      |   "language": "de",
      |   "type": "article",
      |   "primary_location": {"source": {"display_name": "Perspektiven der Wirtschaftspolitik"},
      |     "landing_page_url": "https://doi.org/10.1515/pwp-2023-0031",
      |     "pdf_url": null},
      |   "authorships": [
      |     {"author": {"display_name": "Sommer, Stephan"}},
      |     {"author": {"display_name": "Mattauch, Linus"}},
      |     {"author": {"display_name": "  "}}],
      |   "abstract_inverted_index": {"Eine": [0], "repraesentative": [1],
      |     "Befragung": [2], "von": [3], "6063": [4], "Personen": [5],
      |     "die": [6, 8], "und": [7]},
      |   "topics": [
      |     {"display_name": "Climate policy", "score": 0.99,
      |      "subfield": {"display_name": "Economics"}},
      |     {"display_name": "T2", "score": 0.5, "subfield": null},
      |     {"display_name": "T3", "score": 0.4, "subfield": null},
      |     {"display_name": "T4", "score": 0.3, "subfield": null},
      |     {"display_name": "T5", "score": 0.2, "subfield": null},
      |     {"display_name": "T6-capped", "score": 0.1, "subfield": null}],
      |   "keywords": [{"display_name": "CO2 pricing"}, {"display_name": ""}],
      |   "referenced_works": ["https://openalex.org/W1", "https://openalex.org/W2"],
      |   "related_works": ["https://openalex.org/W3"]},
      |  {"id": "https://openalex.org/W3145167890",
      |   "doi": "",
      |   "title": "Erdgas fuer den Klimaschutz",
      |   "publication_year": 2021,
      |   "language": ""},
      |  {"id": "https://openalex.org/Wuntitled", "doi": "", "title": "",
      |   "display_name": "   "},
      |  {"id": "", "doi": "", "title": "No ids at all"}
      |]}""".stripMargin

  private lazy val out = OpenAlex
    .candidates(Seq(payload).toDF("payload"), "payload", lit("klima"))
    .orderBy("work_idx").collect()

  test("title/canonical rules drop empty-title and no-id works") {
    // 4 works: full record + no-DOI record survive; empty/whitespace title
    // and all-empty-ids records are dropped
    assert(out.length == 2)
    assert(out(0).getAs[String]("source_id") == "openalex")
  }

  test("canonical_url prefers DOI, external_id keeps the OpenAlex id") {
    assert(out(0).getAs[String]("canonical_url") == "https://doi.org/10.1515/pwp-2023-0031")
    assert(out(0).getAs[String]("external_id") == "https://openalex.org/W4391234567")
    assert(out(0).getAs[String]("doi") == "https://doi.org/10.1515/pwp-2023-0031")
  }

  test("canonical_url falls back to the OpenAlex id when DOI is empty") {
    assert(out(1).getAs[String]("canonical_url") == "https://openalex.org/W3145167890")
    assert(out(1).getAs[String]("doi") == null)
  }

  test("abstract reconstructs from the inverted index in position order") {
    assert(out(0).getAs[String]("abstract") ==
      "Eine repraesentative Befragung von 6063 Personen die und die")
    assert(out(1).getAs[String]("abstract") == null) // absent index
  }

  test("authors keep order and drop blank names") {
    assert(out(0).getAs[collection.Seq[String]]("authors").toSeq ==
      Seq("Sommer, Stephan", "Mattauch, Linus"))
    assert(out(1).getAs[collection.Seq[String]]("authors").isEmpty)
  }

  test("publisher, dates, language") {
    assert(out(0).getAs[String]("publisher") == "Perspektiven der Wirtschaftspolitik")
    assert(out(0).getAs[java.sql.Date]("publication_date").toString == "2023-12-01")
    // no publication_date string → publication_year fallback to Jan 1
    assert(out(1).getAs[java.sql.Date]("publication_date").toString == "2021-01-01")
    assert(out(0).getAs[String]("language") == "de")
    assert(out(1).getAs[String]("language") == null) // empty string → None
  }

  test("raw keeps capped topics, truthy keywords, citation-graph ids") {
    val raw = out(0).getAs[org.apache.spark.sql.Row]("raw")
    val topics = raw.getAs[collection.Seq[org.apache.spark.sql.Row]]("topics")
    assert(topics.length == 5) // [:5] cap — T6-capped is gone
    assert(topics.head.getAs[String]("display_name") == "Climate policy")
    assert(topics.head.getAs[String]("subfield") == "Economics")
    assert(raw.getAs[collection.Seq[String]]("keywords").toSeq == Seq("CO2 pricing"))
    assert(raw.getAs[collection.Seq[String]]("referenced_works").length == 2)
    assert(raw.getAs[collection.Seq[String]]("related_works").length == 1)
    assert(raw.getAs[String]("landing_page_url") ==
      "https://doi.org/10.1515/pwp-2023-0031")
  }

  test("date wire formats: %Y-%m and %Y parse; garbage falls to year") {
    val df = Seq(
      ("""{"results":[{"id":"W1","title":"a","publication_date":"2022-11"}]}""", 1),
      ("""{"results":[{"id":"W2","title":"b","publication_date":"2021"}]}""", 2),
      ("""{"results":[{"id":"W3","title":"c","publication_date":"junk","publication_year":2020}]}""", 3),
      ("""{"results":[{"id":"W4","title":"d","publication_date":"junk","publication_year":2100}]}""", 4))
      .toDF("payload", "n")
    val got = OpenAlex.candidates(df, "payload").orderBy("n")
      .select("publication_date").collect()
      .map(r => Option(r.getAs[java.sql.Date]("publication_date")).map(_.toString))
    assert(got.toSeq == Seq(Some("2022-11-01"), Some("2021-01-01"),
      Some("2020-01-01"), None)) // 2100 fails 1900 < y < 2100
  }
}
