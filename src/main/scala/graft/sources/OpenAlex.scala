package graft.sources

import graft.Tables.T
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Serve._

/** OpenAlex discovery source (S6) — the work→candidate mapping of
  * study_scraper/discovery/openalex.py:187-287 re-expressed as column
  * expressions (fetch/pagination is external by the brief; the parse is
  * the engine-relevant transform).
  *
  * Ported semantics:
  *  - title = (title or display_name or "").strip(); empty → no candidate
  *    (a whitespace-only title does NOT fall back — Python truthiness).
  *  - canonical_url prefers DOI over the OpenAlex id (openalex.py:197-203);
  *    both empty → no candidate. external_id prefers the OpenAlex id.
  *  - authors = trimmed non-empty authorship display names, order kept.
  *  - publisher = primary_location.source.display_name when truthy.
  *  - publication_date = best-effort %Y-%m-%d / %Y-%m / %Y parse, falling
  *    back to Jan 1 of publication_year when 1900 < year < 2100
  *    (openalex.py:344-356).
  *  - abstract is REBUILT from the inverted index (word → positions map →
  *    (position, word) pairs → position-sorted join, openalex.py:328-340):
  *    here flatten/transform over map_entries + array_sort, whose struct
  *    ordering (loc, then word) matches Python's tuple sort exactly.
  *  - raw keeps the debugging subset: location urls, first 5 topics,
  *    first 10 truthy keywords, citation-graph ids capped at 200/side.
  *
  * Everything is per-row higher-order functions — no explode, no shuffle;
  * at 100 TB the parse stays embarrassingly parallel map-side work. */
object OpenAlex {

  private val nameT = StructType(Seq(StructField("display_name", StringType)))

  val workSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("doi", StringType),
    StructField("title", StringType),
    StructField("display_name", StringType),
    StructField("publication_year", IntegerType),
    StructField("publication_date", StringType),
    StructField("language", StringType),
    StructField("type", StringType),
    StructField("primary_location", StructType(Seq(
      StructField("source", nameT),
      StructField("landing_page_url", StringType),
      StructField("pdf_url", StringType)))),
    StructField("authorships", ArrayType(StructType(Seq(
      StructField("author", nameT))))),
    StructField("abstract_inverted_index",
      MapType(StringType, ArrayType(IntegerType))),
    StructField("topics", ArrayType(StructType(Seq(
      StructField("display_name", StringType),
      StructField("score", DoubleType),
      StructField("subfield", nameT))))),
    StructField("keywords", ArrayType(nameT)),
    StructField("referenced_works", ArrayType(StringType)),
    StructField("related_works", ArrayType(StringType))))

  val payloadSchema: StructType = StructType(Seq(
    StructField("meta", StructType(Seq(
      StructField("next_cursor", StringType)))),
    StructField("results", ArrayType(workSchema))))

  /** The inverted-index reconstruction as a standalone column expression
    * (openalex.py:328-340). Null/empty index or no positions → null. */
  def reconstructAbstract(idx: Column): Column = {
    val pairs = flatten(transform(map_entries(idx),
      e => transform(filter(e.getField("value"), l => l.isNotNull),
        l => struct(l.as("loc"), e.getField("key").as("word")))))
    when(idx.isNull || size(pairs) === 0, lit(null).cast(StringType))
      .otherwise(array_join(transform(array_sort(pairs),
        p => p.getField("word")), " "))
  }

  /** Parse a `/works` response payload column into candidate rows. Input
    * columns other than `payloadCol` pass through; works failing the
    * title/canonical-url rules are dropped, order within a payload is the
    * results-array order (openalex.py:172-186). */
  def candidates(docs: DataFrame, payloadCol: String = "payload",
                 discoveryQuery: Column = lit(null).cast(StringType)): DataFrame = {
    val parsed = docs
      .withColumn("__doc", from_json(col(payloadCol), payloadSchema))
      .select(docs.columns.map(col) :+
        posexplode_outer(col("__doc.results")).as(Seq("work_idx", "w")): _*)
    val oid = trim(coalesce(col("w.id"), lit("")))
    val doi = trim(coalesce(col("w.doi"), lit("")))
    parsed
      .withColumn("title", trim(coalesce(
        nullif(col("w.title"), lit("")), nullif(col("w.display_name"), lit("")),
        lit(""))))
      .withColumn("canonical_url", when(doi =!= "", doi).otherwise(oid))
      .filter(col("title") =!= "" && col("canonical_url") =!= "")
      .withColumn("external_id", when(oid =!= "", oid).otherwise(doi))
      .withColumn("authors",
        filter(transform(coalesce(col("w.authorships"),
            array().cast(workSchema("authorships").dataType)),
          a => trim(coalesce(a.getField("author").getField("display_name"), lit("")))),
          s => s =!= ""))
      .withColumn("publisher",
        nullif(col("w.primary_location.source.display_name"), lit("")))
      .withColumn("publication_date", coalesce(
        try_to_timestamp(col("w.publication_date"), lit("yyyy-MM-dd")).cast(DateType),
        try_to_timestamp(col("w.publication_date"), lit("yyyy-MM")).cast(DateType),
        try_to_timestamp(col("w.publication_date"), lit("yyyy")).cast(DateType),
        when(col("w.publication_year") > 1900 && col("w.publication_year") < 2100,
          make_date(col("w.publication_year"), lit(1), lit(1)))))
      .withColumn("language", nullif(lower(coalesce(col("w.language"), lit(""))), lit("")))
      .withColumn("abstract", reconstructAbstract(col("w.abstract_inverted_index")))
      .withColumn("doi", nullif(doi, lit("")))
      .withColumn("discovery_query", discoveryQuery)
      .withColumn("raw", struct(
        oid.as("openalex_id"),
        col("doi"),
        col("w.primary_location.landing_page_url").as("landing_page_url"),
        col("w.primary_location.pdf_url").as("pdf_url"),
        col("w.type").as("type"),
        // [:5] then the isinstance(dict) guard: null entries are dropped
        // AFTER the slice, matching the reference's order
        transform(filter(slice(coalesce(col("w.topics"),
            array().cast(workSchema("topics").dataType)), 1, 5),
            t => t.isNotNull),
          t => struct(
            t.getField("display_name").as("display_name"),
            t.getField("score").as("score"),
            t.getField("subfield").getField("display_name").as("subfield")))
          .as("topics"),
        filter(transform(slice(coalesce(col("w.keywords"),
            array().cast(workSchema("keywords").dataType)), 1, 10),
          k => k.getField("display_name")), s => s.isNotNull && s =!= "")
          .as("keywords"),
        slice(filter(coalesce(col("w.referenced_works"), array().cast(
          ArrayType(StringType))), r => r.isNotNull), 1, 200).as("referenced_works"),
        slice(filter(coalesce(col("w.related_works"), array().cast(
          ArrayType(StringType))), r => r.isNotNull), 1, 200).as("related_works")))
      .withColumn("source_id", lit("openalex"))
      .drop("__doc", "w", payloadCol)
  }

  /** q66 — the OpenAlex parse as a declared query: per-document synthetic
    * `/works` payloads (title/display_name fallback and skip rules, DOI →
    * canonical preference, three date wire formats + year fallback, an
    * inverted-index abstract built from the document's own first 10 words)
    * are round-tripped through to_json → candidates(), so the oracle can
    * recompute every output scalar straight from the documents table —
    * the reconstruction must return exactly the original word prefix. */
  def q66OpenAlexParse(t: T): DataFrame = {
    val d = t.documents
      .withColumn("words", slice(split(trim(col("text")), "\\s+"), 1, 10))
      // word → positions map over the held prefix; tiny n so the O(n²)
      // position filter is constant work per row
      .withColumn("inv_idx", expr(
        "map_from_entries(transform(array_distinct(words), " +
          "w -> struct(w, filter(sequence(0, size(words) - 1), i -> words[i] = w))))"))
    val work = struct(
      concat(lit("https://openalex.org/W"), col("doc_id")).as("id"),
      when(col("doc_id") % 3 === 0, lit(""))
        .otherwise(concat(lit("https://doi.org/10.1000/g"), col("doc_id"))).as("doi"),
      when(col("doc_id") % 17 === 0 || col("doc_id") % 5 === 0, lit(""))
        .otherwise(concat(lit("Work "), col("doc_id"), lit(" T"))).as("title"),
      when(col("doc_id") % 17 === 0, lit(""))
        .otherwise(concat(lit("  Work "), col("doc_id"), lit(" D  "))).as("display_name"),
      (lit(1950) + col("doc_id") % 200).cast("int").as("publication_year"),
      when(col("doc_id") % 4 === 0, lit("2023-05-17"))
        .when(col("doc_id") % 4 === 1, lit("2022-11"))
        .when(col("doc_id") % 4 === 2, lit("2021"))
        .otherwise(lit("not a date")).as("publication_date"),
      when(col("doc_id") % 2 === 0, lit("DE")).otherwise(lit("")).as("language"),
      lit("article").as("type"),
      struct(
        struct(when(col("doc_id") % 7 === 0, lit(""))
          .otherwise(concat(lit("Journal "), col("doc_id") % 13)).as("display_name"))
          .as("source"),
        concat(lit("https://ex.org/"), col("doc_id")).as("landing_page_url"),
        lit(null).cast(StringType).as("pdf_url")).as("primary_location"),
      expr("transform(sequence(1, CAST(1 + doc_id % 3 AS INT)), " +
        "i -> struct(struct(concat('Author ', doc_id, '-', i) as display_name) as author))")
        .as("authorships"),
      when(col("doc_id") % 11 === 0,
        lit(null).cast(MapType(StringType, ArrayType(IntegerType))))
        .otherwise(col("inv_idx")).as("abstract_inverted_index"),
      expr("transform(sequence(1, 6), i -> struct(" +
        "concat('Topic ', i) as display_name, CAST(i AS DOUBLE) / 2 as score, " +
        "struct(concat('Sub ', i) as display_name) as subfield))").as("topics"),
      expr("transform(sequence(1, 3), " +
        "i -> struct(concat('kw', i) as display_name))").as("keywords"),
      // sequence(1, 0) DESCENDS — an explicit empty for the %7==0 docs
      when(col("doc_id") % 7 === 0, array().cast(ArrayType(StringType)))
        .otherwise(expr("transform(sequence(1, CAST(doc_id % 7 AS INT)), " +
          "i -> concat('https://openalex.org/WR', i))")).as("referenced_works"),
      array().cast(ArrayType(StringType)).as("related_works"))
    val payloads = d
      .select(col("doc_id"),
        to_json(struct(array(work).as("results"))).as("payload"))
    candidates(payloads, "payload", lit("klima"))
      .select(
        col("doc_id"), col("external_id"), col("canonical_url"), col("title"),
        col("publisher"), col("publication_date"), col("language"),
        col("abstract"),
        concat_ws("; ", col("authors")).as("authors_joined"),
        size(col("raw.referenced_works")).as("n_refs"),
        size(col("raw.topics")).as("n_topics"),
        array_join(col("raw.keywords"), ",").as("keywords_joined"))
      // EAGER checkpoint: the parse chain above is narrow (no shuffle), so
      // a lazy checkpoint under smallSort's coalesce(1) would be computed
      // by the one merged task — serializing the whole per-row JSON parse
      // (measured 0.96 s -> 2.0 s at sf0.1). Eager materializes it with
      // full scan parallelism; the one-partition sort then just reads the
      // 5 k checkpointed rows.
      .localCheckpoint()
      .smallSort("doc_id")
  }
}
