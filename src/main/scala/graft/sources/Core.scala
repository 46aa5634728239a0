package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CORE search discovery source (S6) — the work→candidate mapping of
  * study_scraper/discovery/core_search.py:151-223 as column expressions.
  *
  * Ported semantics:
  *  - title = (title or "").strip(); empty → no candidate.
  *  - CORE returns BARE DOIs ("10.x/y"); the candidate carries the bare
  *    DOI but canonical_url gets the navigable https://doi.org/ form,
  *    then falls back to downloadUrl, then the display link, then the
  *    CORE work page (core_search.py:168-178, 230-236); all empty → no
  *    candidate.
  *  - publishedDate parses as %Y-%m-%dT%H:%M:%S%z (taking the LITERAL
  *    date fields, as strptime().date() does — no timezone shift) or
  *    %Y-%m-%d; a bare datetime WITHOUT offset matches neither and falls
  *    through to the yearPublished Jan-1 fallback (1900 < y < 2100).
  *  - language comes from the {code, name} object, lowercased, empty →
  *    null; publisher/abstract strip-or-null; authors trimmed non-empty.
  *  - raw keeps core_id, download/document type, first 5 data providers.
  */
object Core {

  val workSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("abstract", StringType),
    StructField("authors", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
    StructField("doi", StringType),
    StructField("documentType", StringType),
    StructField("downloadUrl", StringType),
    StructField("language", StructType(Seq(
      StructField("code", StringType), StructField("name", StringType)))),
    StructField("publisher", StringType),
    StructField("publishedDate", StringType),
    StructField("yearPublished", IntegerType),
    StructField("dataProviders", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))),
    StructField("links", ArrayType(StructType(Seq(
      StructField("type", StringType), StructField("url", StringType)))))))

  val payloadSchema: StructType = StructType(Seq(
    StructField("totalHits", LongType),
    StructField("results", ArrayType(workSchema))))

  /** strptime("%Y-%m-%dT%H:%M:%S%z").date() keeps the literal date; only
    * a full offset-carrying stamp or a bare date parses at all. %z also
    * accepts seconds-bearing offsets (+01:00:00), hence the seconds
    * groups; separators must be CONSISTENT (either ±HHMM[SS] or
    * ±HH:MM[:SS]) — CPython's %z rejects mixed forms like +01:0000, so
    * the alternation tracks strptime exactly instead of `:?` per field;
    * zero-padded date fields are assumed (the API emits them padded). */
  private def publishedDate(v: Column): Column =
    when(v.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(Z|[+-]\\d{2}(\\d{2}(\\d{2})?|:\\d{2}(:\\d{2})?))$"),
      try_to_timestamp(substring(v, 1, 10), lit("yyyy-MM-dd")).cast(DateType))
      .otherwise(try_to_timestamp(v, lit("yyyy-MM-dd")).cast(DateType))

  def candidates(docs: DataFrame, payloadCol: String = "payload",
                 discoveryQuery: Column = lit(null).cast(StringType)): DataFrame = {
    val parsed = docs
      .withColumn("__doc", from_json(col(payloadCol), payloadSchema))
      .select(docs.columns.map(col) :+
        posexplode_outer(col("__doc.results")).as(Seq("work_idx", "w")): _*)
    val coreId = trim(coalesce(col("w.id").cast(StringType), lit("")))
    val doi = trim(coalesce(col("w.doi"), lit("")))
    val doiUrl = when(doi =!= "", concat(lit("https://doi.org/"), doi)).otherwise(lit(""))
    val downloadUrl = trim(coalesce(col("w.downloadUrl"), lit("")))
    // get(), not [0]: ANSI throws on indexing an empty filter result
    val displayUrl = coalesce(
      get(filter(coalesce(col("w.links"), array().cast(workSchema("links").dataType)),
        l => l.getField("type") === "display" && l.getField("url").isNotNull &&
          l.getField("url") =!= ""), lit(0)).getField("url"),
      when(col("w.id").isNotNull, concat(lit("https://core.ac.uk/works/"), coreId)))
    parsed
      .withColumn("title", trim(coalesce(col("w.title"), lit(""))))
      .withColumn("canonical_url",
        when(doiUrl =!= "", doiUrl)
          .when(downloadUrl =!= "", downloadUrl)
          .otherwise(coalesce(displayUrl, lit(""))))
      .filter(col("title") =!= "" && col("canonical_url") =!= "")
      .withColumn("external_id",
        when(coreId =!= "", coreId).when(doi =!= "", doi)
          .otherwise(col("canonical_url")))
      .withColumn("authors",
        filter(transform(coalesce(col("w.authors"),
            array().cast(workSchema("authors").dataType)),
          a => trim(coalesce(a.getField("name"), lit("")))), s => s =!= ""))
      .withColumn("publisher", nullif(trim(coalesce(col("w.publisher"), lit(""))), lit("")))
      .withColumn("publication_date", coalesce(
        publishedDate(col("w.publishedDate")),
        when(col("w.yearPublished") > 1900 && col("w.yearPublished") < 2100,
          make_date(col("w.yearPublished"), lit(1), lit(1)))))
      .withColumn("language",
        nullif(lower(trim(coalesce(col("w.language.code"), lit("")))), lit("")))
      .withColumn("abstract", nullif(trim(coalesce(col("w.abstract"), lit(""))), lit("")))
      .withColumn("doi", nullif(doi, lit("")))
      .withColumn("discovery_query", discoveryQuery)
      .withColumn("raw", struct(
        nullif(coreId, lit("")).as("core_id"),
        nullif(downloadUrl, lit("")).as("download_url"),
        nullif(trim(coalesce(col("w.documentType"), lit(""))), lit(""))
          .as("document_type"),
        filter(transform(slice(coalesce(col("w.dataProviders"),
            array().cast(workSchema("dataProviders").dataType)), 1, 5),
          dp => dp.getField("name")), s => s.isNotNull && s =!= "")
          .as("data_providers")))
      .withColumn("source_id", lit("core"))
      .drop("__doc", "w", payloadCol)
  }
}
