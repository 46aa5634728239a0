package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DAWUM poll-document source (S1) — the reference's highest-value feed.
  *
  * The API returns ONE root JSON document holding the entire poll database
  * (study_scraper/sources/dawum.py:3-11, FIXTURES.md §1): surveys keyed by
  * id plus five id→label reference maps (Institutes, Taskers, Parliaments,
  * Methods, Parties). The reference denormalizes per survey in Python
  * (dawum.py:91-160, connectors/dawum_connector.py:102-142); here the
  * whole document parses with one explicit schema and denormalization is
  * map element access on the SAME parsed column — no joins, no shuffles,
  * pure column expressions. One poll×party row per Results entry.
  */
object Dawum {

  private val named = StructType(Seq(StructField("Name", StringType)))

  val rootSchema: StructType = StructType(Seq(
    StructField("Database", StructType(Seq(StructField("Version", StringType)))),
    StructField("Last_Update", StringType),
    StructField("Surveys", MapType(StringType, StructType(Seq(
      StructField("Institute_ID", StringType),
      StructField("Tasker_ID", StringType),
      StructField("Parliament_ID", StringType),
      StructField("Method_ID", StringType),
      StructField("Survey_Period", StructType(Seq(
        StructField("Date_Start", StringType),
        StructField("Date_End", StringType)))),
      StructField("Date", StringType),
      StructField("Surveyed_Persons", StringType),
      StructField("Results", MapType(StringType, DoubleType)))))),
    StructField("Institutes", MapType(StringType, named)),
    StructField("Taskers", MapType(StringType, named)),
    StructField("Parliaments", MapType(StringType, StructType(Seq(
      StructField("Name", StringType), StructField("Shortcut", StringType))))),
    StructField("Methods", MapType(StringType, named)),
    StructField("Parties", MapType(StringType, StructType(Seq(
      StructField("Name", StringType), StructField("Shortcut", StringType)))))))

  /** Parse a frame with a `payload` JSON-string column (one row per fetched
    * document) into denormalized poll×party rows. Malformed documents and
    * surveys with unparseable dates are skipped, string sample sizes
    * coerce with try_cast (dawum.py:117-125 semantics). */
  def polls(docs: DataFrame): DataFrame =
    docs
      .withColumn("doc", from_json(col("payload"), rootSchema))
      .filter(col("doc").isNotNull && col("doc.Surveys").isNotNull)
      .select(explode(col("doc.Surveys")).as(Seq("survey_id", "s")),
        col("doc.Institutes").as("institutes"),
        col("doc.Taskers").as("taskers"),
        col("doc.Parliaments").as("parliaments"),
        col("doc.Methods").as("methods"),
        col("doc.Parties").as("parties"))
      .select(
        col("survey_id"),
        // try_cast, not to_date: "surveys with unparseable dates are
        // skipped" is the documented contract (dawum.py:117-125), and
        // under ANSI mode a plain to_date would ABORT the whole parse on
        // one malformed survey (q144 plants exactly that)
        expr("try_cast(s.Date AS DATE)").as("poll_date"),
        expr("try_cast(s.Survey_Period.Date_Start AS DATE)").as("period_start"),
        expr("try_cast(s.Survey_Period.Date_End AS DATE)").as("period_end"),
        expr("try_cast(s.Surveyed_Persons AS INT)").as("surveyed"),
        element_at(col("institutes"), col("s.Institute_ID"))
          .getField("Name").as("institute"),
        element_at(col("taskers"), col("s.Tasker_ID"))
          .getField("Name").as("tasker"),
        element_at(col("parliaments"), col("s.Parliament_ID"))
          .getField("Shortcut").as("parliament"),
        element_at(col("methods"), col("s.Method_ID"))
          .getField("Name").as("method"),
        explode(col("s.Results")).as(Seq("party_id", "pct")),
        col("parties"))
      .withColumn("party",
        coalesce(element_at(col("parties"), col("party_id")).getField("Shortcut"),
          col("party_id")))
      .drop("parties")
      .filter(col("poll_date").isNotNull)

  /** q144 — S1 DAWUM denormalize as a DECLARED query (r12 ask #5: the
    * fixture-parity sources get oracle rows): a DAWUM root document is
    * built DETERMINISTICALLY from the events table — one survey per
    * event_id % 97 row, three Results parties each, the five reference
    * maps as literals — and run through the REAL [[polls]] parse +
    * denormalize. The oracle recomputes the expected poll×party rows
    * straight from events arithmetic (no JSON on the DuckDB side), so
    * the hash pins the whole parse → explode → map-lookup → filter
    * path: unparseable poll dates drop their survey (e % 13), string
    * sample sizes coerce via try_cast with 'n/a' → null (e % 10), a
    * Results party absent from the Parties map falls back to its id
    * ('203'), and malformed / surveys-less documents are skipped (two
    * planted rows). Percent values are halves (x/2), exactly
    * representable, so the JSON-parsed double and the oracle's division
    * agree bit-for-bit.
    *
    * Scale shape: the DAWUM API returns ONE root document for the whole
    * poll database by contract (dawum.py:3-11 — the real feed is a
    * single ~15 MB JSON), so the single-row parse is the source's own
    * bound; scale fans out at the per-survey explode, and everything
    * after the parse is pure column algebra. */
  def q144DawumDenormalize(t: graft.Tables.T): DataFrame = {
    import t.spark.implicits._
    val pct: String => String = x =>
      s"CAST(($x) % 120 DIV 2 AS STRING), " +
        s"CASE WHEN ($x) % 2 = 0 THEN '.0' ELSE '.5' END"
    val frag = t.events
      .filter(col("event_id") % 97 === 0 &&
        col("event_id").isNotNull && col("ts").isNotNull)
      .select(expr(s"""concat(
        |'"', CAST(event_id AS STRING),
        |'":{"Institute_ID":"', CAST(1 + event_id % 5 AS STRING),
        |'","Tasker_ID":"', CAST(1 + event_id % 3 AS STRING),
        |'","Parliament_ID":"', CAST(1 + event_id % 4 AS STRING),
        |'","Method_ID":"', CAST(1 + event_id % 2 AS STRING),
        |'","Survey_Period":{"Date_Start":"',
        |  date_format(date_sub(to_date(ts), 7), 'yyyy-MM-dd'),
        |'","Date_End":"', date_format(to_date(ts), 'yyyy-MM-dd'),
        |'"},"Date":"',
        |  CASE WHEN event_id % 13 = 0 THEN 'kaputt'
        |       ELSE date_format(to_date(ts), 'yyyy-MM-dd') END,
        |'","Surveyed_Persons":"',
        |  CASE WHEN event_id % 10 = 0 THEN 'n/a'
        |       ELSE CAST(500 + event_id % 1500 AS STRING) END,
        |'","Results":{"101":', ${pct("event_id")},
        |',"102":', ${pct("event_id + 7")},
        |',"203":', ${pct("event_id + 13")}, '}}')""".stripMargin).as("f"))
    val refs =
      ""","Institutes":{"1":{"Name":"Inst A"},"2":{"Name":"Inst B"},
        |"3":{"Name":"Inst C"},"4":{"Name":"Inst D"},"5":{"Name":"Inst E"}},
        |"Taskers":{"1":{"Name":"Tasker X"},"2":{"Name":"Tasker Y"},
        |"3":{"Name":"Tasker Z"}},
        |"Parliaments":{"1":{"Name":"Bundestag","Shortcut":"BT"},
        |"2":{"Name":"Europaparlament","Shortcut":"EP"},
        |"3":{"Name":"Landtag Bayern","Shortcut":"LT-BY"},
        |"4":{"Name":"Landtag NRW","Shortcut":"LT-NW"}},
        |"Methods":{"1":{"Name":"Online"},"2":{"Name":"Telefon"}},
        |"Parties":{"101":{"Name":"Partei Eins","Shortcut":"P1"},
        |"102":{"Name":"Partei Zwei","Shortcut":"P2"}}}"""
        .stripMargin.replace("\n", "")
    val payload = frag.agg(concat(
      lit("""{"Database":{"Version":"1"},"Last_Update":"2024-01-01","Surveys":{"""),
      expr("array_join(array_sort(collect_list(f)), ',')"),
      lit("}" + refs)).as("payload"))
    val docs = payload
      .unionByName(Seq("""{"broken""", "{}").toDF("payload"))
    polls(docs)
      .orderBy(expr("CAST(survey_id AS BIGINT)"), col("party_id"))
  }
}
