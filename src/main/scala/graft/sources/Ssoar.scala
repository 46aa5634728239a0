package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SSOAR OAI-PMH discovery source (S6) — the reference's tier-1 XML feed
  * (study_scraper/discovery/ssoar.py, fixtures under
  * tests/study_scraper/fixtures/ssoar/).
  *
  * One fetched OAI-PMH `ListRecords` response parses with one explicit
  * schema via Spark 4's native `from_xml` — the whole document becomes a
  * struct, records explode to rows, and every per-record rule
  * (ssoar.py:149-215) is a column expression: no XML walking in driver
  * code, no UDFs, and the parse distributes per response document at
  * 100 TB harvest scale.
  *
  * Rules mirrored from `_record_to_candidate`:
  *  - header@status="deleted" records are skipped
  *  - records without any non-blank title or any http identifier are
  *    skipped
  *  - canonical_url = first http identifier; doi = first identifier
  *    containing "doi.org/", starting with "doi:" (case-insensitive), or
  *    starting with "10."
  *  - abstract = descriptions joined with newlines, null when empty
  *  - publication_date = first dc:date value parsing as yyyy-MM-dd,
  *    yyyy-MM, or yyyy (ssoar.py:239-246)
  *  - language = first value resolving through the ISO 639-2→1 map
  *    (deu/ger→de, eng→en, fra/fre→fr) or already a known 639-1 code
  */
object Ssoar {

  private val dcArr = ArrayType(StringType)

  /** Dublin Core payload: every field as an array — the XML reader wraps
    * single occurrences, so multiplicity differences between records
    * can't flip the schema. */
  val dcSchema: StructType = StructType(Seq(
    StructField("dc:title", dcArr), StructField("dc:creator", dcArr),
    StructField("dc:subject", dcArr), StructField("dc:description", dcArr),
    StructField("dc:publisher", dcArr), StructField("dc:date", dcArr),
    StructField("dc:type", dcArr), StructField("dc:identifier", dcArr),
    StructField("dc:language", dcArr), StructField("dc:rights", dcArr)))

  val recordSchema: StructType = StructType(Seq(
    StructField("header", StructType(Seq(
      StructField("identifier", StringType),
      StructField("datestamp", StringType),
      StructField("_status", StringType)))),
    StructField("metadata", StructType(Seq(
      StructField("oai_dc:dc", dcSchema))))))

  /** The OAI-PMH envelope: ListRecords > record[] (+ resumptionToken —
    * the live path's pagination cursor, ssoar.py:237-246). */
  val rootSchema: StructType = StructType(Seq(
    StructField("responseDate", StringType),
    StructField("ListRecords", StructType(Seq(
      StructField("record", ArrayType(recordSchema)),
      StructField("resumptionToken", StringType))))))

  /** Trimmed, non-blank texts of one dc field (`_dc_texts`). */
  private def texts(field: String) =
    expr(s"filter(transform(coalesce(dc.`$field`, array()), x -> trim(x)), x -> x <> '')")

  /** First trimmed text or null — `get` (not `[0]`/element_at), which
    * tolerates the empty array under ANSI mode. */
  private def firstText(field: String) =
    expr(s"get(filter(transform(coalesce(dc.`$field`, array()), " +
      "x -> trim(x)), x -> x <> ''), 0)")

  /** Parse a frame with a `payload` XML-string column (one row per fetched
    * OAI-PMH response) into candidate rows. */
  def candidates(docs: DataFrame, topicId: String): DataFrame =
    docs
      .withColumn("doc", from_xml(col("payload"), rootSchema))
      .filter(col("doc").isNotNull && col("doc.ListRecords.record").isNotNull)
      .select(explode(col("doc.ListRecords.record")).as("rec"))
      .filter(coalesce(col("rec.header._status") =!= "deleted", lit(true)))
      .withColumn("dc", col("rec.metadata.`oai_dc:dc`"))
      .filter(col("dc").isNotNull)
      .withColumn("titles", texts("dc:title"))
      .withColumn("ids", texts("dc:identifier"))
      .withColumn("canonical_url",
        expr("get(filter(ids, u -> u LIKE 'http%'), 0)"))
      .filter(size(col("titles")) > 0 && col("canonical_url").isNotNull)
      .withColumn("doi", expr(
        "get(filter(ids, u -> contains(u, 'doi.org/') OR lower(u) LIKE 'doi:%' " +
          "OR u LIKE '10.%'), 0)"))
      .withColumn("publication_date", expr(
        """get(filter(transform(filter(transform(coalesce(dc.`dc:date`, array()),
          |    x -> trim(x)), x -> x <> ''),
          |  v -> coalesce(try_to_date(v, 'yyyy-MM-dd'),
          |                try_to_date(v, 'yyyy-MM'),
          |                try_to_date(v, 'yyyy'))),
          |  d -> d IS NOT NULL), 0)""".stripMargin))
      .withColumn("language", expr(
        """get(filter(transform(coalesce(dc.`dc:language`, array()),
          |  v -> CASE WHEN lower(trim(v)) IN ('deu', 'ger') THEN 'de'
          |            WHEN lower(trim(v)) = 'eng' THEN 'en'
          |            WHEN lower(trim(v)) IN ('fra', 'fre') THEN 'fr'
          |            WHEN lower(trim(v)) IN ('de', 'en', 'fr', 'es', 'it',
          |                                    'nl', 'pl', 'pt', 'ru')
          |              THEN lower(trim(v))
          |       END),
          |  l -> l IS NOT NULL), 0)""".stripMargin))
      .select(
        lit("ssoar").as("source_id"),
        coalesce(nullif(trim(col("rec.header.identifier")), lit("")),
          col("canonical_url")).as("external_id"),
        col("canonical_url"),
        element_at(col("titles"), 1).as("title"),
        texts("dc:creator").as("authors"),
        firstText("dc:publisher").as("publisher"),
        col("publication_date"),
        col("language"),
        nullif(array_join(texts("dc:description"), "\n"), lit("")).as("abstract"),
        col("doi"),
        lit(topicId).as("discovery_query"),
        texts("dc:subject").as("subjects"),
        texts("dc:type").as("types"),
        texts("dc:rights").as("rights"))

  /** The live path's pagination cursor, when present. */
  def resumptionToken(docs: DataFrame): DataFrame =
    docs
      .withColumn("doc", from_xml(col("payload"), rootSchema))
      .select(nullif(trim(col("doc.ListRecords.resumptionToken")), lit(""))
        .as("resumption_token"))
}
