package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bundestag DIP discovery source (S6) — the Drucksache→candidate mapping
  * of study_scraper/discovery/bundestag_dip.py:163-217 as column
  * expressions.
  *
  * Ported semantics:
  *  - a document needs BOTH a non-blank titel and id, else no candidate;
  *  - canonical_url = fundstelle.pdf_url, falling back to the DIP
  *    drucksache page for the id;
  *  - publisher = "; "-joined truthy urheber titles (titel, else
  *    bezeichnung), falling back to "Deutscher Bundestag";
  *  - publication_date = strict %Y-%m-%d parse of `datum` (DIP's own
  *    _parse_iso_date is single-format, bundestag_dip.py:250-256, unlike
  *    OpenAlex's 3-format chain); language is always "de"; authors empty;
  *    abstract passes through UNtrimmed (the reference does not strip it);
  *  - raw keeps drucksachetyp/dokumentart/dokumentnummer/wahlperiode/
  *    herausgeber, the pdf_url (null when blank), and the first 10
  *    vorgangsbezug entries as (id, titel, vorgangstyp). */
object BundestagDip {

  val docSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("titel", StringType),
    StructField("abstract", StringType),
    StructField("datum", StringType),
    StructField("drucksachetyp", StringType),
    StructField("dokumentart", StringType),
    StructField("wahlperiode", IntegerType),
    StructField("fundstelle", StructType(Seq(
      StructField("pdf_url", StringType),
      StructField("dokumentnummer", StringType),
      StructField("herausgeber", StringType)))),
    StructField("urheber", ArrayType(StructType(Seq(
      StructField("titel", StringType),
      StructField("bezeichnung", StringType))))),
    StructField("vorgangsbezug", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("titel", StringType),
      StructField("vorgangstyp", StringType)))))))

  val payloadSchema: StructType = StructType(Seq(
    StructField("numFound", LongType),
    StructField("cursor", StringType),
    StructField("documents", ArrayType(docSchema))))

  def candidates(docs: DataFrame, payloadCol: String = "payload",
                 discoveryQuery: Column = lit(null).cast(StringType)): DataFrame = {
    val parsed = docs
      .withColumn("__doc", from_json(col(payloadCol), payloadSchema))
      .select(docs.columns.map(col) :+
        posexplode_outer(col("__doc.documents")).as(Seq("doc_idx", "d")): _*)
    val docId = trim(coalesce(col("d.id"), lit("")))
    val pdfUrl = trim(coalesce(col("d.fundstelle.pdf_url"), lit("")))
    val urheberJoined = array_join(
      filter(transform(coalesce(col("d.urheber"),
          array().cast(docSchema("urheber").dataType)),
        u => coalesce(nullif(u.getField("titel"), lit("")),
          nullif(u.getField("bezeichnung"), lit("")), lit(""))),
        s => s =!= ""), "; ")
    parsed
      .withColumn("title", trim(coalesce(col("d.titel"), lit(""))))
      .withColumn("external_id", docId)
      .filter(col("title") =!= "" && col("external_id") =!= "")
      .withColumn("canonical_url",
        when(pdfUrl =!= "", pdfUrl)
          .otherwise(concat(lit("https://dip.bundestag.de/drucksache/"), docId)))
      .withColumn("publisher",
        when(urheberJoined =!= "", urheberJoined)
          .otherwise(lit("Deutscher Bundestag")))
      .withColumn("publication_date",
        try_to_timestamp(col("d.datum"), lit("yyyy-MM-dd")).cast(DateType))
      .withColumn("language", lit("de"))
      .withColumn("authors", array().cast(ArrayType(StringType)))
      .withColumn("abstract", col("d.abstract"))
      .withColumn("discovery_query", discoveryQuery)
      .withColumn("raw", struct(
        docId.as("dip_id"),
        col("d.drucksachetyp").as("drucksachetyp"),
        col("d.dokumentart").as("dokumentart"),
        col("d.fundstelle.dokumentnummer").as("dokumentnummer"),
        col("d.wahlperiode").as("wahlperiode"),
        col("d.fundstelle.herausgeber").as("herausgeber"),
        nullif(pdfUrl, lit("")).as("pdf_url"),
        // [:10] then the isinstance(dict) guard — null entries dropped
        // after the slice, as in the reference
        filter(slice(coalesce(col("d.vorgangsbezug"),
          array().cast(docSchema("vorgangsbezug").dataType)), 1, 10),
          e => e.isNotNull)
          .as("vorgangsbezug")))
      .withColumn("source_id", lit("bundestag_dip"))
      .drop("__doc", "d", payloadCol)
  }
}
