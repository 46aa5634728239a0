package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Serve._

/** GovData.de CKAN lake source (S6) — Germany's cross-government open-data
  * catalog via CKAN `package_search`
  * (study_scraper/sources/govdata.py:62-243).
  *
  * Input is one row per fetched `package_search` response document
  * (`{"result": {"count", "results": [...]}}`, govdata.py:132-134); each
  * dataset in `results` becomes one lake record. `_build_record`
  * (`:195-243`) rules as column expressions:
  *
  *  - dataset_id = `id` falling back to `name` (Python truthiness: empty
  *    strings fall through), trimmed; blank → record skipped
  *  - canonical_url = `https://www.govdata.de/dataset/<name or id>`
  *  - license = `license_title` → `license_id` → the catalog default
  *    ("Data License Germany 2.0"); captured per record, never blanket
  *  - provenance hints: title_hint = `title`, publisher_hint =
  *    organization `title` → `name`
  *  - payload preserves the dataset (typed projection of the CKAN fields,
  *    incl. `resources` download URLs and `extras`); content_hash =
  *    sha256 over its canonical JSON. As with [[Eurobarometer]], the
  *    canonical form is Spark's `to_json` (alphabetical struct fields,
  *    nulls kept) rather than Python `json.dumps(sort_keys=True)` — hash
  *    values differ from the reference by design, run-to-run stability on
  *    unchanged upstream data is what's contracted.
  */
object GovData {

  val sourceId = "govdata"
  val recordFormat = "govdata_ckan_package"
  val defaultLicense = "Data License Germany 2.0 (dl-de/by-2-0)"

  /** CKAN dataset fields, alphabetical so `to_json` mirrors
    * `json.dumps(sort_keys=True)` key order (govdata.py:215-218). */
  val datasetSchema: StructType = StructType(Seq(
    StructField("extras", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", StringType))))),
    StructField("id", StringType),
    StructField("license_id", StringType),
    StructField("license_title", StringType),
    StructField("license_url", StringType),
    StructField("metadata_created", StringType),
    StructField("metadata_modified", StringType),
    StructField("name", StringType),
    StructField("notes", StringType),
    StructField("organization", StructType(Seq(
      StructField("name", StringType), StructField("title", StringType)))),
    StructField("resources", ArrayType(StructType(Seq(
      StructField("format", StringType), StructField("name", StringType),
      StructField("url", StringType))))),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
    StructField("title", StringType)))

  val responseSchema: StructType = StructType(Seq(
    StructField("result", StructType(Seq(
      StructField("count", LongType),
      StructField("results", ArrayType(datasetSchema)))))))

  /** Python-truthy string fallback: empty strings fall through like None. */
  private def truthy(c: org.apache.spark.sql.Column) =
    when(c.isNotNull && c =!= "", c)

  /** Parse a frame with a `payload` JSON-string column (one
    * `package_search` response per row) into one lake record per dataset. */
  def records(docs: DataFrame): DataFrame =
    docs
      .withColumn("doc", from_json(col("payload"), responseSchema))
      .filter(col("doc.result.results").isNotNull)
      .select(explode(col("doc.result.results")).as("d"))
      .withColumn("dataset_id",
        trim(coalesce(truthy(col("d.id")), truthy(col("d.name")), lit(""))))
      .filter(col("dataset_id") =!= "")
      .withColumn("name_t", trim(coalesce(col("d.name"), lit(""))))
      .select(
        lit(sourceId).as("source_id"),
        col("dataset_id").as("source_record_id"),
        concat(lit("https://www.govdata.de/dataset/"),
          coalesce(truthy(col("name_t")), col("dataset_id")))
          .as("canonical_url"),
        lit(recordFormat).as("format"),
        lit("application/json").as("content_type"),
        sha2(to_json(col("d"), Map("ignoreNullFields" -> "false")), 256)
          .as("content_hash"),
        coalesce(truthy(col("d.license_title")), truthy(col("d.license_id")),
          lit(defaultLicense)).as("license"),
        col("d.title").as("title_hint"),
        coalesce(truthy(col("d.organization.title")),
          col("d.organization.name")).as("publisher_hint"),
        col("d").as("payload"))

  /** q68 — the GovData CKAN parse as a declared query: per-part synthetic
    * `package_search` payloads exercise every `_build_record` rule — the
    * id→name fallback (and the both-blank skip), the name-or-id canonical
    * url, the license_title→license_id→default chain, and the
    * organization title→name publisher hint — and are round-tripped
    * through to_json → records(), so the oracle recomputes every output
    * scalar straight from the part table. content_hash is excluded (its
    * canonical form is Spark's to_json, not recomputable in SQL). */
  def q68GovdataParse(t: graft.Tables.T): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val k = col("p_partkey")
    val ks = k.cast(StringType)
    val ds = struct(
      when(k % 7 =!= 0, concat(lit("id-"), ks)).cast(StringType).as("id"),
      when(k % 5 =!= 0, concat(lit("ds-"), ks)).cast(StringType).as("name"),
      col("p_name").as("title"),
      when(k % 3 >= 1, concat(lit("lic-"), (k % 4).cast(StringType)))
        .cast(StringType).as("license_id"),
      when(k % 3 === 2, concat(lit("Lizenz "), col("p_type")))
        .cast(StringType).as("license_title"),
      struct(
        concat(lit("org-"), col("p_type")).as("name"),
        when(k % 2 =!= 0, concat(lit("Org "), col("p_brand")))
          .cast(StringType).as("title")).as("organization"))
    val payloads = t.part.select(
      to_json(struct(struct(lit(1).cast("long").as("count"),
        array(ds).as("results")).as("result"))).as("payload"))
    records(payloads)
      .select("source_record_id", "canonical_url", "license",
        "title_hint", "publisher_hint")
      .localCheckpoint(false)
      .smallSort("source_record_id")
  }

  /** Derive `package_search` terms from a topic's include_keywords
    * (govdata.py:246-268): German locale first, include_keywords only
    * (not synonyms), case-insensitive dedup, capped at `maxTerms`.
    * Driver-side config helper — topics are a handful of constants. */
  def topicQueryTerms(
      locales: Seq[(String, Seq[String])], maxTerms: Int = 6): Seq[String] = {
    val ordered = locales.sortBy { case (lang, _) => lang != "de" }
    val seen = collection.mutable.Set[String]()
    val terms = collection.mutable.ArrayBuffer[String]()
    for ((_, keywords) <- ordered; term <- keywords) {
      val key = term.trim.toLowerCase
      if (key.nonEmpty && !seen.contains(key)) {
        seen += key
        terms += term.trim
      }
    }
    terms.take(maxTerms).toSeq
  }
}
