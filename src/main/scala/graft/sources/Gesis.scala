package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GESIS Knowledge-Graph source (S4) — the reference's SPARQL-JSON
  * parsing (connectors/gesis_connector.py:46-194). Two payload shapes:
  *
  *  - `listDatasets`: a SELECT result of dataset URIs → one row each.
  *  - `datasetMetadata`: per-resource CONSTRUCT/SELECT bindings of
  *    (p, o) triples, folded into one metadata record per resource with
  *    the reference's rules: predicate short name = last '/' then '#'
  *    segment; fuzzy elif mapping title / abstract|description /
  *    creator / issued|date / variable where for the scalar fields the
  *    LAST matching binding wins (dict overwrite semantics), variables
  *    dedup in first-appearance order, a properties map with last-wins
  *    keys, and the "Dataset <id tail>" title fallback.
  *
  * All folding is aggregate expressions over posexploded binding rows —
  * binding ORDER is the semantic carrier, so `pos` travels through every
  * aggregate (max-by-pos = overwrite, min-by-pos = first appearance). */
object Gesis {

  private val valueT = StructType(Seq(StructField("value", StringType)))

  val bindingsSchema: StructType = StructType(Seq(
    StructField("results", StructType(Seq(
      StructField("bindings", ArrayType(StructType(Seq(
        StructField("d", valueT), StructField("s", valueT),
        StructField("p", valueT), StructField("o", valueT))))))))))

  /** SELECT-?d list result → (id, type, title) rows (list_datasets). */
  def listDatasets(docs: DataFrame): DataFrame =
    docs
      .withColumn("doc", from_json(col("payload"), bindingsSchema))
      .filter(col("doc.results.bindings").isNotNull)
      .select(explode(col("doc.results.bindings")).as("b"))
      .filter(col("b.d.value").isNotNull)
      .select(
        col("b.d.value").as("id"),
        lit("https://schema.org/Dataset").as("type"),
        lit("").as("title"))

  /** Per-resource bindings → one metadata record per resource_id. Input
    * carries (resource_id, payload). */
  def datasetMetadata(docs: DataFrame): DataFrame = {
    val exploded = docs
      .withColumn("doc", from_json(col("payload"), bindingsSchema))
      .filter(col("doc.results.bindings").isNotNull)
      .select(col("resource_id"),
        posexplode(col("doc.results.bindings")).as(Seq("pos", "b")))
      .select(col("resource_id"), col("pos"),
        col("b.p.value").as("p"), col("b.o.value").as("o"))
      .filter(col("p").isNotNull && col("p") =!= "" &&
        col("o").isNotNull && col("o") =!= "")
      .withColumn("prop_short",
        element_at(split(element_at(split(col("p"), "/"), -1), "#"), -1))
      .withColumn("cat",
        when(lower(col("prop_short")).contains("title"), "title")
          .when(lower(col("prop_short")).contains("abstract") ||
            lower(col("prop_short")).contains("description"), "description")
          .when(lower(col("prop_short")).contains("creator"), "creator")
          .when(lower(col("prop_short")).contains("issued") ||
            lower(col("prop_short")).contains("date"), "issued")
          .when(lower(col("prop_short")).contains("variable"), "variable"))
    // last-wins per predicate short name (dict overwrite), keyed map
    val perProp = exploded
      .groupBy("resource_id", "prop_short")
      .agg(max(struct(col("pos"), col("o"))).as("last"),
        max(col("cat")).as("cat")) // cat is a function of prop_short
    def lastOf(cat: String) =
      max(when(col("cat") === cat, struct(col("last.pos"), col("last.o"))))
        .getField("o")
    val scalars = perProp
      .groupBy("resource_id")
      .agg(
        lastOf("title").as("mapped_title"),
        lastOf("description").as("description"),
        lastOf("creator").as("creator"),
        lastOf("issued").as("issued"),
        expr("map_from_entries(array_sort(collect_list(struct(prop_short, last.o))))")
          .as("properties"))
    // variables: distinct values in first-appearance order
    val vars = exploded.filter(col("cat") === "variable")
      .groupBy("resource_id", "o").agg(min("pos").as("first_pos"))
      .groupBy("resource_id")
      .agg(expr("transform(array_sort(collect_list(struct(first_pos, o))), e -> e.o)")
        .as("variables"))
    docs.select("resource_id").distinct()
      .join(scalars, Seq("resource_id"), "left")
      .join(vars, Seq("resource_id"), "left")
      .select(
        col("resource_id").as("id"),
        lit("https://schema.org/Dataset").as("type"),
        coalesce(col("mapped_title"),
          concat(lit("Dataset "),
            element_at(split(col("resource_id"), "/"), -1))).as("title"),
        coalesce(col("description"), lit("")).as("description"),
        coalesce(col("creator"), lit("")).as("creator"),
        coalesce(col("issued"), lit("")).as("issued"),
        expr("coalesce(variables, array())").as("variables"),
        when(col("properties").isNotNull, "success").otherwise("error")
          .as("status"),
        coalesce(col("properties"), map()).as("properties"))
  }

  /** q145 — S4 GESIS metadata fold as a DECLARED query (r12 ask #5):
    * per-resource SPARQL-JSON binding payloads built deterministically
    * from documents rows (doc_id % 7), run through the REAL
    * [[datasetMetadata]] fold. Coverage by construction: a SECOND title
    * binding later in the list overwrites (last-wins, doc_id % 5 = 1), a
    * missing title falls back to "Dataset <id tail>" (doc_id % 3 = 0),
    * duplicate variables dedup in FIRST-appearance order, an unmapped
    * predicate (dcat#keyword) lands only in the properties map, and an
    * all-empty-object payload yields the error row with every default
    * (doc_id % 11 = 0). The oracle recomputes every output column from
    * doc_id arithmetic — no JSON on the DuckDB side — so the hash pins
    * parse → posexplode → last-wins/first-wins folds → fallbacks.
    * Arrays/maps serve as joined strings (driver-compare contract). */
  def q145GesisFold(t: graft.Tables.T): DataFrame = {
    def b(p: String, o: String) =
      s"""concat('{"p":{"value":"$p"},"o":{"value":"', $o, '"}}')"""
    val i = "CAST(doc_id AS STRING)"
    val payload = s"""CASE WHEN doc_id % 11 = 0 THEN
      |  '{"results":{"bindings":[{"p":{"value":"http://x/skip"},"o":{"value":""}}]}}'
      |ELSE concat('{"results":{"bindings":[',
      |  array_join(filter(array(
      |    CASE WHEN doc_id % 3 != 0 THEN
      |      ${b("http://purl.org/dc/terms/title", s"'T0_', $i")} END,
      |    ${b("https://schema.org/description", s"'D_', $i")},
      |    ${b("http://purl.org/dc/terms/creator", s"'C_', $i")},
      |    ${b("http://purl.org/dc/terms/issued", s"'Y', $i")},
      |    ${b("https://schema.org/variableMeasured",
             "'v', CAST(doc_id % 4 AS STRING)")},
      |    ${b("https://schema.org/variableMeasured",
             "'v', CAST((doc_id + 1) % 4 AS STRING)")},
      |    ${b("https://schema.org/variableMeasured",
             "'v', CAST(doc_id % 4 AS STRING)")},
      |    ${b("http://www.w3.org/ns/dcat#keyword", s"'kw_', $i")},
      |    CASE WHEN doc_id % 5 = 1 THEN
      |      ${b("http://purl.org/dc/terms/title", s"'T8_', $i")} END
      |  ), x -> x IS NOT NULL), ','), ']}}')
      |END""".stripMargin
    val docs = t.documents
      .filter(col("doc_id") % 7 === 0 && col("doc_id").isNotNull)
      .select(
        concat(lit("https://data.gesis.org/ds/"), col("doc_id"))
          .as("resource_id"),
        expr(payload).as("payload"))
    datasetMetadata(docs)
      .select(col("id"), col("type"), col("title"), col("description"),
        col("creator"), col("issued"),
        concat_ws("|", col("variables")).as("variables"),
        col("status"),
        expr("array_join(transform(array_sort(map_entries(properties)), " +
          "e -> concat(e.key, '=', e.value)), ';')").as("properties"))
      .orderBy("id")
  }
}
