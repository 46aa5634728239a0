package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SOEP indicator-metadata source (S5) — the reference's summary+detail
  * merge (connectors/soep_connector.py:127-352): the list endpoint yields
  * summaries, each slug's detail endpoint yields a richer payload, and
  * `_merge_summary_and_detail` combines them with field-specific
  * precedence. Re-expressed as two schema'd JSON parses and one
  * slug-keyed left join (details are the smaller side — broadcast):
  *
  *  - summary-first: id, slug, short_description
  *  - detail-first:  title, subtitle, source, last_updated_at
  *  - detail-only:   long_description_html, methodology, available_years,
  *                   dimensions (list → map keyed by dimension/name)
  *  - topics: detail's list else summary's, normalized to title/name
  *    strings (`_normalise_topics`)
  *  - unit: detail struct → "label (description)" / label; else the
  *    summary's plain string (`_resolve_unit`)
  *  - summaries without a slug are skipped (fetch_metadata:139-143)
  */
object Soep {

  private val topicsT = ArrayType(StructType(Seq(
    StructField("title", StringType), StructField("name", StringType))))

  val summarySchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("slug", StringType),
    StructField("title", StringType), StructField("subtitle", StringType),
    StructField("short_description", StringType),
    StructField("topics", topicsT), StructField("unit", StringType),
    StructField("source", StringType),
    StructField("last_updated_at", StringType)))

  val detailSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("slug", StringType),
    StructField("title", StringType), StructField("subtitle", StringType),
    StructField("short_description", StringType),
    StructField("long_description_html", StringType),
    StructField("topics", topicsT),
    StructField("dimensions", ArrayType(StructType(Seq(
      StructField("dimension", StringType), StructField("name", StringType),
      StructField("categories", ArrayType(StringType)))))),
    StructField("unit", StructType(Seq(
      StructField("label", StringType), StructField("name", StringType),
      StructField("description", StringType)))),
    StructField("source", StringType), StructField("methodology", StringType),
    StructField("available_years", ArrayType(IntegerType)),
    StructField("last_updated_at", StringType)))

  /** Merge summary payloads with their per-slug detail payloads. Both
    * inputs carry a `payload` JSON-string column. */
  def mergeMetadata(summaries: DataFrame, details: DataFrame): DataFrame = {
    val s = summaries
      .withColumn("s", from_json(col("payload"), summarySchema))
      .filter(col("s").isNotNull && col("s.slug").isNotNull)
      .select(col("s"))
    val d = details
      .withColumn("d", from_json(col("payload"), detailSchema))
      .filter(col("d").isNotNull && col("d.slug").isNotNull)
      .select(col("d"))
    s.join(broadcast(d), col("s.slug") === col("d.slug"), "left")
      .select(
        coalesce(col("s.id"), col("d.id")).as("id"),
        col("s.slug").as("slug"),
        coalesce(col("d.title"), col("s.title")).as("title"),
        coalesce(col("d.subtitle"), col("s.subtitle")).as("subtitle"),
        coalesce(col("s.short_description"), col("d.short_description"))
          .as("short_description"),
        col("d.long_description_html").as("long_description_html"),
        expr("""filter(transform(coalesce(d.topics, s.topics, array()),
                |  t -> coalesce(t.title, t.name)), x -> x IS NOT NULL)"""
          .stripMargin).as("topics"),
        expr("""map_from_entries(transform(
                |  filter(coalesce(d.dimensions, array()),
                |    dim -> coalesce(dim.dimension, dim.name) IS NOT NULL),
                |  dim -> struct(coalesce(dim.dimension, dim.name) AS key,
                |                dim.categories AS value)))""".stripMargin)
          .as("dimensions"),
        expr("""CASE
                |  WHEN coalesce(d.unit.label, d.unit.name) IS NOT NULL
                |       AND d.unit.description IS NOT NULL
                |    THEN concat(coalesce(d.unit.label, d.unit.name),
                |                ' (', d.unit.description, ')')
                |  WHEN coalesce(d.unit.label, d.unit.name) IS NOT NULL
                |    THEN coalesce(d.unit.label, d.unit.name)
                |  ELSE s.unit
                |END""".stripMargin).as("unit"),
        coalesce(col("d.source"), col("s.source")).as("source"),
        col("d.methodology").as("methodology"),
        expr("coalesce(d.available_years, array())").as("available_years"),
        coalesce(col("d.last_updated_at"), col("s.last_updated_at"))
          .as("last_updated_at"))
  }
}
