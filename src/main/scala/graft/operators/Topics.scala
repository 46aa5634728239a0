package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topic classification — T3 scoring + T11 routing
  * (study_scraper/topic_filter.py:62-115, pipeline/topic_classifier.py:
  * 329-413) and the A14 eval harness (study_scraper/eval/harness.py:52-151).
  *
  * The taxonomy is a handful of rows → broadcast cross join against the
  * corpus; matching is substring containment over the lowercased blob;
  * scoring is pure arithmetic over matched-term array sizes. At 100 TB the
  * corpus side never shuffles — every document scores all topics map-side.
  */
object Topics {

  /** (topic_id, includes, synonyms, excludes) — terms from the synthetic
    * corpus vocabulary so matches actually occur. */
  private val taxonomy: Seq[(String, Seq[String], Seq[String], Seq[String])] = Seq(
    ("scans",   Seq("scan", "table"),  Seq("read", "page"),   Seq.empty),
    ("joins",   Seq("join", "merge"),  Seq("hash", "bucket"), Seq("broken")),
    ("sorting", Seq("sort", "order"),  Seq("key"),            Seq.empty),
    ("tuning",  Seq("slow", "fast"),   Seq("cache", "spill"), Seq("vacuum")))

  private def lit_(xs: Seq[String]) = array(xs.map(lit): _*)

  def taxonomyDf(t: T): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    taxonomy.toDF("topic_id", "includes", "synonyms", "excludes")
  }

  /** q48 — score every (document, topic) pair: excludes short-circuit,
    * 0.2/include capped 0.4, 0.1/synonym capped 0.2 (synonyms already in
    * the matched includes don't double-count), route assign ≥ 0.5 /
    * review > 0 (topic_classifier.py:399-413 HIGH/LOW thresholds). */
  def q48TopicScoring(t: T): DataFrame =
    t.documents
      .withColumn("blob", lower(col("text")))
      .crossJoin(broadcast(taxonomyDf(t)))
      .withColumn("exc_matched",
        expr("filter(excludes, x -> contains(blob, x))"))
      .withColumn("inc_matched",
        expr("filter(includes, x -> contains(blob, x))"))
      .withColumn("syn_matched",
        expr("filter(synonyms, s -> contains(blob, s) AND NOT array_contains(includes, s))"))
      .withColumn("score",
        when(size(col("exc_matched")) > 0, 0.0)
          .otherwise(
            least(lit(0.4), lit(0.2) * size(col("inc_matched"))) +
              least(lit(0.2), lit(0.1) * size(col("syn_matched")))))
      .filter(col("score") > 0.0)
      .withColumn("route",
        when(col("score") >= 0.5, "assign").otherwise("review"))
      .withColumn("rationale",
        concat(lit("matched: "), array_join(
          concat(col("inc_matched"), col("syn_matched")), ", ")))
      .select("doc_id", "topic_id", "score", "route", "rationale")
      .orderBy("doc_id", "topic_id")

  /** q49 — eval metrics per topic: the scorer's assignments vs a stricter
    * pseudo-gold rule (first include term present), classified tp/fp/fn
    * per (doc, topic) then rolled into precision / recall / F1
    * (harness.py:52-151 shapes; micro-averaged per topic). */
  def q49EvalMetrics(t: T): DataFrame = {
    val scored = t.documents
      .withColumn("blob", lower(col("text")))
      .crossJoin(broadcast(taxonomyDf(t)))
      .withColumn("excluded",
        size(expr("filter(excludes, x -> contains(blob, x))")) > 0)
      .withColumn("score",
        when(col("excluded"), 0.0).otherwise(
          least(lit(0.4), lit(0.2) * size(expr("filter(includes, x -> contains(blob, x))"))) +
            least(lit(0.2), lit(0.1) * size(expr(
              "filter(synonyms, s -> contains(blob, s) AND NOT array_contains(includes, s))")))))
      .withColumn("predicted", col("score") >= 0.3)
      .withColumn("gold", expr("contains(blob, includes[0])") && !col("excluded"))
    scored
      .groupBy("topic_id")
      .agg(
        count(when(col("predicted") && col("gold"), 1)).as("tp"),
        count(when(col("predicted") && !col("gold"), 1)).as("fp"),
        count(when(!col("predicted") && col("gold"), 1)).as("fn"))
      // nullif guards: ANSI mode (Spark 4 default) raises on divide-by-zero.
      // Double literals (2.0D), not 2.0: bare decimal literals make the
      // whole expression DECIMAL-typed in Spark SQL and shift the rounding.
      .withColumn("precision", expr("CAST(tp AS DOUBLE) / nullif(tp + fp, 0)"))
      .withColumn("recall", expr("CAST(tp AS DOUBLE) / nullif(tp + fn, 0)"))
      .withColumn("f1",
        expr("2.0D * precision * recall / nullif(precision + recall, 0.0D)"))
      .orderBy("topic_id")
  }
}
