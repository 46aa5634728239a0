package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Serve._

/** Eurobarometer lake source (S6) — the GESIS Knowledge-Graph catalog
  * filtered to Eurobarometer waves, emitted under its own `source_id`
  * (study_scraper/sources/eurobarometer.py:78-295).
  *
  * Input is one row per fetched document in the fixture/live wrapper
  * shape (`{"datasets": [{"uri", "triples": [{p,o,type,lang,datatype}]}]}`,
  * eurobarometer.py:136-143); each dataset entry becomes one lake record.
  * All `_build_record` rules (`:248-295`) are column expressions, so the
  * parse distributes per response document:
  *
  *  - entries with a blank uri or no triples are skipped (`:147-150`)
  *  - title_hint = first `type=literal` triple among the name/title
  *    predicates (`_first_literal`, `:321-329`)
  *  - license = first non-empty value among the license predicates (any
  *    node type, `_first_value`), falling back to the archive default
  *  - doi = first triple on a DOI-ish predicate whose value matches one
  *    of: contains "doi.org/" (take the tail), starts with "doi:"
  *    (case-insensitive, strip it), bare "10.x/y" (`_first_doi`,
  *    `:332-353`)
  *  - source_record_id = last `/`-then-`#` segment of the uri
  *    (`_extract_source_record_id`, `:356-365`)
  *  - payload = uri + triples sorted by (p, o) (`:262-267`);
  *    content_hash = sha256 over its canonical JSON. The canonical form
  *    here is Spark's `to_json` (alphabetical struct fields, nulls kept)
  *    rather than Python's `json.dumps(sort_keys=True)`, so hash VALUES
  *    differ from the reference by design; the contract that matters —
  *    identical upstream data hashes identically across runs — holds.
  */
object Eurobarometer {

  val sourceId = "eurobarometer"
  val recordFormat = "eurobarometer_kg_sparql_json"
  val defaultLicense = "GESIS terms of use (Eurobarometer data archive)"

  /** Triple fields ordered alphabetically so `to_json` mirrors
    * `json.dumps(sort_keys=True)` key order (eurobarometer.py:268-270). */
  private val tripleT = StructType(Seq(
    StructField("datatype", StringType), StructField("lang", StringType),
    StructField("o", StringType), StructField("p", StringType),
    StructField("type", StringType)))

  val wrapperSchema: StructType = StructType(Seq(
    StructField("datasets", ArrayType(StructType(Seq(
      StructField("uri", StringType),
      StructField("triples", ArrayType(tripleT))))))))

  private val titleProps = Seq(
    "https://schema.org/name", "http://schema.org/name",
    "http://purl.org/dc/terms/title")
  private val licenseProps = Seq(
    "https://schema.org/license", "http://schema.org/license",
    "http://purl.org/dc/terms/license")
  private val doiProps = Seq(
    "https://schema.org/sameAs", "https://schema.org/identifier",
    "http://purl.org/dc/terms/identifier")

  private def inList(c: String, vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString(s"$c IN (", ", ", ")")

  /** Parse a frame with a `payload` JSON-string column (one fixture/live
    * wrapper document per row) into one lake record per dataset uri. */
  def records(docs: DataFrame): DataFrame = {
    val exploded = docs
      .withColumn("doc", from_json(col("payload"), wrapperSchema))
      .filter(col("doc.datasets").isNotNull)
      .select(explode(col("doc.datasets")).as("d"))
      .select(trim(col("d.uri")).as("uri"), col("d.triples").as("triples"))
      .filter(col("uri") =!= "" && size(col("triples")) > 0)

    // Python sorts by (p or "", str(o)) — str(None) is the string "None"
    // (eurobarometer.py:264-266), mirrored in the comparator's coalesce.
    val sortedTriples = expr(
      """array_sort(triples, (l, r) ->
        |  CASE WHEN struct(coalesce(l.p, ''), coalesce(l.o, 'None'))
        |          < struct(coalesce(r.p, ''), coalesce(r.o, 'None')) THEN -1
        |       WHEN struct(coalesce(l.p, ''), coalesce(l.o, 'None'))
        |          > struct(coalesce(r.p, ''), coalesce(r.o, 'None')) THEN 1
        |       ELSE 0 END)""".stripMargin)

    val titleHint = expr(
      s"get(filter(triples, t -> ${inList("t.p", titleProps)} " +
        "AND t.o IS NOT NULL AND t.o <> '' AND t.type = 'literal'), 0).o")
    val licenseVal = expr(
      s"get(filter(triples, t -> ${inList("t.p", licenseProps)} " +
        "AND t.o IS NOT NULL AND t.o <> ''), 0).o")

    // First triple on a DOI-ish predicate whose value matches one of the
    // three extraction rules; precedence inside `when` mirrors the
    // reference's if/elif (doi.org/ tail, then doi: prefix, then bare 10.x).
    val doiCandidate = expr(
      s"get(filter(triples, t -> t.o IS NOT NULL AND " +
        s"(${inList("t.p", doiProps)} OR lower(coalesce(t.p, '')) LIKE '%doi%') AND " +
        "(t.o LIKE '%doi.org/%' OR lower(t.o) LIKE 'doi:%' OR " +
        "(t.o LIKE '10.%' AND t.o LIKE '%/%'))), 0).o")
    val cand = col("doi_cand")
    // split("doi.org/", 1)[1]: everything after the FIRST occurrence
    val doi: Column = when(cand.contains("doi.org/"),
        trim(cand.substr(instr(cand, "doi.org/") + lit(8), length(cand))))
      .when(lower(cand).startsWith("doi:"), trim(cand.substr(lit(5), length(cand))))
      .otherwise(trim(cand))

    exploded
      .withColumn("sorted_triples", sortedTriples)
      .withColumn("title_hint", titleHint)
      .withColumn("license_val", licenseVal)
      .withColumn("doi_cand", doiCandidate)
      .select(
        lit(sourceId).as("source_id"),
        // rstrip('/'), then last '#' segment, then last '/' segment; a uri
        // whose last segment is empty (e.g. 'https://x.org/a#') yields
        // None in the reference's _extract_source_record_id — nullif
        // mirrors that 'bare or None' return instead of emitting ''
        nullif(element_at(split(element_at(split(
          regexp_replace(col("uri"), "/+$", ""), "#"), -1), "/"), -1), lit(""))
          .as("source_record_id"),
        col("uri").as("canonical_url"),
        lit(recordFormat).as("format"),
        lit("application/sparql-results+json").as("content_type"),
        sha2(to_json(
          struct(col("sorted_triples").as("triples"), col("uri")),
          Map("ignoreNullFields" -> "false")), 256).as("content_hash"),
        doi.as("doi"),
        coalesce(col("license_val"), lit(defaultLicense)).as("license"),
        col("title_hint"),
        struct(col("uri"), col("sorted_triples").as("triples")).as("payload"))
  }

  /** q69 — the Eurobarometer parse as a declared query: per-document
    * synthetic KG wrappers exercise every `_build_record` rule — blank-uri
    * and empty-triples skips, trailing-slash record-id extraction, the
    * literal-only title rule, all three DOI extraction forms (doi.org
    * tail / doi: prefix / bare 10.x) plus the no-DOI case, and the
    * license default — round-tripped through to_json → records(), so the
    * oracle recomputes every output scalar from the documents table.
    * content_hash excluded (not SQL-recomputable, see [[records]]). */
  def q69EurobarometerParse(t: graft.Tables.T): DataFrame = {
    val d = col("doc_id")
    def triple(p: Column, o: Column, typ: String): Column = struct(
      lit(null).cast(StringType).as("datatype"),
      lit(null).cast(StringType).as("lang"),
      o.as("o"), p.as("p"), lit(typ).as("type"))
    val nameTriple = triple(lit("https://schema.org/name"),
      concat(lit("Eurobarometer Welle "), d.cast(StringType)),
      "literal")
    // %11 docs carry the name as a uri node — the literal-only rule must
    // leave title_hint null for them
    val nameT = when(d % 11 === 0,
      triple(lit("https://schema.org/name"),
        concat(lit("Eurobarometer Welle "), d.cast(StringType)), "uri"))
      .otherwise(nameTriple)
    val ds = d.cast(StringType)
    val ident = when(d % 4 === 0,
        triple(lit("https://schema.org/identifier"),
          concat(lit("https://doi.org/10.4232/1.9"), ds), "uri"))
      .when(d % 4 === 1,
        triple(lit("https://schema.org/identifier"),
          concat(lit("doi:10.4232/1.9"), ds), "literal"))
      .when(d % 4 === 2,
        triple(lit("https://schema.org/identifier"),
          concat(lit("10.4232/1.9"), ds), "literal"))
      .otherwise(
        triple(lit("https://schema.org/identifier"),
          concat(lit("urn:nbn:de:"), ds), "uri"))
    val lic = when(d % 3 =!= 0,
      array(triple(lit("https://schema.org/license"),
        concat(lit("https://www.gesis.org/lic/"), (d % 5).cast(StringType)), "uri")))
      .otherwise(array().cast(ArrayType(tripleT)))
    val uri = when(d % 13 === 0, lit(""))
      .otherwise(concat(lit("https://data.gesis.org/datasearchkg/Dataset/10.4232/1.9"),
        ds, when(d % 19 === 0, lit("/")).otherwise(lit(""))))
    val triples = when(d % 17 === 0, array().cast(ArrayType(tripleT)))
      .otherwise(concat(array(nameT, ident), lic))
    val payloads = t.documents.select(
      to_json(struct(array(struct(uri.as("uri"), triples.as("triples")))
        .as("datasets"))).as("payload"))
    records(payloads)
      .select("source_record_id", "canonical_url", "doi", "license",
        "title_hint")
      .localCheckpoint(false)
      .smallSort("source_record_id")
  }
}
