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

  /** q146 — S5 SOEP summary+detail merge as a DECLARED query (r12 ask
    * #5): summary payloads from documents rows (doc_id % 5), detail
    * payloads for half their slugs (doc_id % 10), merged by the REAL
    * [[mergeMetadata]]. Coverage by construction: summary-first vs
    * detail-first precedence per field, slug-less summaries skipped
    * (doc_id % 35 = 0), detail topics overriding summary topics only
    * when present (doc_id % 20 = 0), the three unit resolutions —
    * "label (description)" (% 30 = 0), bare name (% 30 = 10), summary
    * string fallback — and dimensions list → map keyed by
    * dimension-else-name. Oracle recomputes everything from doc_id
    * arithmetic; arrays/maps serve as joined strings. */
  def q146SoepMerge(t: graft.Tables.T): DataFrame = {
    val i = "CAST(doc_id AS STRING)"
    val base = t.documents.filter(col("doc_id").isNotNull)
    val summaries = base.filter(col("doc_id") % 5 === 0)
      .select(expr(s"""concat('{"id":', $i,
        |',"slug":', CASE WHEN doc_id % 35 = 0 THEN 'null'
        |            ELSE concat('"ind-', $i, '"') END,
        |',"title":"ST_', $i, '","subtitle":"SS_', $i,
        |'","short_description":"SD_', $i,
        |'","topics":[{"title":"t', CAST(doc_id % 3 AS STRING),
        |'","name":null},{"title":null,"name":"n',
        |CAST(doc_id % 3 AS STRING), '"}]',
        |',"unit":"u', CAST(doc_id % 2 AS STRING),
        |'","source":"src-s","last_updated_at":"2024-01-0',
        |CAST(1 + doc_id % 9 AS STRING), '"}')""".stripMargin).as("payload"))
    val details = base.filter(col("doc_id") % 10 === 0)
      .select(expr(s"""concat('{"id":', $i, ',"slug":"ind-', $i, '"',
        |',"title":', CASE WHEN doc_id % 20 = 0
        |             THEN concat('"DT_', $i, '"') ELSE 'null' END,
        |',"subtitle":null,"short_description":null',
        |',"long_description_html":"<p>L_', $i, '</p>"',
        |',"topics":', CASE WHEN doc_id % 20 = 0
        |  THEN concat('[{"title":"dt', CAST(doc_id % 3 AS STRING),
        |    '","name":null}]') ELSE 'null' END,
        |',"dimensions":[{"dimension":"sex","name":null,"categories":["m","f"]},',
        |'{"dimension":null,"name":"age","categories":["a1"]}]',
        |',"unit":', CASE
        |  WHEN doc_id % 30 = 0 THEN
        |    '{"label":"UL","name":null,"description":"UD"}'
        |  WHEN doc_id % 30 = 10 THEN
        |    '{"label":null,"name":"UN","description":null}'
        |  ELSE 'null' END,
        |',"source":"src-d","methodology":"M_', $i,
        |'","available_years":[', CAST(2000 + doc_id % 20 AS STRING),
        |',', CAST(2001 + doc_id % 20 AS STRING),
        |'],"last_updated_at":"2025-02-02"}')""".stripMargin).as("payload"))
    mergeMetadata(summaries, details)
      .select(col("id"), col("slug"), col("title"), col("subtitle"),
        col("short_description"), col("long_description_html"),
        concat_ws("|", col("topics")).as("topics"),
        expr("array_join(transform(map_entries(dimensions), " +
          "e -> concat(e.key, '=', array_join(e.value, ','))), ';')")
          .as("dimensions"),
        col("unit"), col("source"), col("methodology"),
        concat_ws("|", col("available_years")).as("available_years"),
        col("last_updated_at"))
      .orderBy("id")
  }
}
