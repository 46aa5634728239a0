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
        to_date(col("s.Date")).as("poll_date"),
        to_date(col("s.Survey_Period.Date_Start")).as("period_start"),
        to_date(col("s.Survey_Period.Date_End")).as("period_end"),
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
}
