package graft

import graft.sources.Dawum

/** Fixture-parity test: the same document shape the reference's fixture
  * tests feed through sources/dawum.py (FIXTURES.md §1,
  * tests/study_scraper/fixtures/dawum/sample.json). */
class DawumSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    """{
      |  "Database": {"Version": "0.1.0"},
      |  "Last_Update": "2026-05-28T08:00:00",
      |  "Surveys": {
      |    "101": {
      |      "Institute_ID": "1", "Tasker_ID": "2", "Parliament_ID": "0",
      |      "Method_ID": "1",
      |      "Survey_Period": {"Date_Start": "2026-05-19", "Date_End": "2026-05-23"},
      |      "Date": "2026-05-26",
      |      "Surveyed_Persons": "1002",
      |      "Results": {"7": 30.0, "8": 16.5}
      |    },
      |    "102": {
      |      "Institute_ID": "1", "Tasker_ID": "2", "Parliament_ID": "0",
      |      "Method_ID": "1",
      |      "Survey_Period": {"Date_Start": "2026-05-01", "Date_End": "2026-05-02"},
      |      "Date": "2026-05-03",
      |      "Surveyed_Persons": "not-a-number",
      |      "Results": {"7": 28.0}
      |    }
      |  },
      |  "Institutes":  {"1": {"Name": "Forsa"}},
      |  "Taskers":     {"2": {"Name": "Stern"}},
      |  "Parliaments": {"0": {"Name": "Bundestag", "Shortcut": "BT"}},
      |  "Methods":     {"1": {"Name": "Telefon"}},
      |  "Parties":     {"7": {"Name": "Party Seven", "Shortcut": "P7"},
      |                  "8": {"Name": "Party Eight", "Shortcut": "P8"}}
      |}""".stripMargin

  test("root document denormalizes to poll×party rows with label lookups") {
    val rows = Dawum.polls(Seq(fixture).toDF("payload"))
      .orderBy("survey_id", "party")
      .collect()
    assert(rows.length == 3)
    val first = rows(0)
    assert(first.getAs[String]("survey_id") == "101")
    assert(first.getAs[String]("institute") == "Forsa")
    assert(first.getAs[String]("tasker") == "Stern")
    assert(first.getAs[String]("parliament") == "BT")
    assert(first.getAs[String]("method") == "Telefon")
    assert(first.getAs[Int]("surveyed") == 1002)
    assert(first.getAs[String]("party") == "P7")
    assert(first.getAs[Double]("pct") == 30.0)
    assert(first.getAs[java.sql.Date]("poll_date").toString == "2026-05-26")
  }

  test("string sample size coerces; bad values become null not errors") {
    val rows = Dawum.polls(Seq(fixture).toDF("payload"))
      .filter($"survey_id" === "102").collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("surveyed")))
  }

  test("unknown party ids fall back to the raw id; malformed docs skipped") {
    val doc =
      """{"Surveys": {"5": {"Institute_ID": "9", "Date": "2026-01-01",
        |  "Results": {"99": 12.0}}},
        |"Institutes": {}, "Parties": {}}""".stripMargin
    val rows = Dawum.polls(Seq(doc, "not json").toDF("payload")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("party") == "99")
    assert(rows.head.isNullAt(rows.head.fieldIndex("institute")))
  }
}
