package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-function families from SURVEY.md §2.8 that the relational suite
  * does not already exercise: hashing, best-effort multi-format date
  * parsing, array/lambda aggregates, and ILIKE-style text search with
  * pipe-separated query alternatives.
  */
object Scalars {

  /** q42 — hash family: sha256 deterministic ids (models.py:22-26), md5
    * metadata hashes (adapters/metadata.py:35-49), and a hash-derived
    * shard bucket (the 100 TB partitioning primitive). xxhash64 also
    * exists engine-side (cityHash64's role, stg_dawum_polls.sql:110-115)
    * but is Spark-specific, so the oracle-checked bucket uses the portable
    * md5-prefix hash instead; xxhash64 is covered in the scalatest suite. */
  def q42HashFamily(t: T): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        sha2(col("p_name"), 256).as("sha_name"),
        md5(concat_ws("|", col("p_brand"), col("p_type"))).as("md5_meta"),
        (expr(TextDedup.h60(0, "p_name")) % 16).as("shard_bucket"))
      .orderBy("p_partkey")

  /** q43 — parseDateTimeBestEffort (raw_dawum_polls.sql:16-24,
    * loader_clickhouse.py:717-732): three wire formats round-trip through a
    * try_to_timestamp coalesce chain, then feed the toYYYYMM partition key
    * and date arithmetic (fact_polls.sql:148,193-197). */
  def q43DateBestEffort(t: T): DataFrame = {
    val built = t.orders.withColumn("raw_date",
      when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "dd.MM.yyyy"))
        .otherwise(date_format(col("o_orderdate"), "MM/dd/yyyy")))
    built
      // Structural dispatch instead of a blind coalesce chain: the three
      // wire formats have DISJOINT separators ('-' at pos 5, '.' at pos 3,
      // '/' otherwise), so picking the one plausible format first is
      // value-identical to first-successful-parse for EVERY input — a
      // string matching an earlier guard but failing its parse cannot
      // parse under a later format either (wrong separators) and yields
      // the same null. Each row now pays exactly one formatter attempt;
      // the failed try_to_timestamp attempts were the query's dominant
      // cost (an internal exception per failure, ~2 of 3 rows).
      .withColumn("parsed",
        when(substring(col("raw_date"), 5, 1) === "-",
          try_to_timestamp(col("raw_date"), lit("yyyy-MM-dd")))
          .when(substring(col("raw_date"), 3, 1) === ".",
            try_to_timestamp(col("raw_date"), lit("dd.MM.yyyy")))
          .otherwise(try_to_timestamp(col("raw_date"), lit("MM/dd/yyyy"))))
      .select(
        col("o_orderkey"), col("raw_date"), col("parsed"),
        date_format(col("parsed"), "yyyyMM").as("part_month"),
        quarter(col("parsed")).as("q"),
        datediff(lit("2002-01-01").cast("date"), col("parsed").cast("date"))
          .as("days_to_ref"))
      // materialize once before the serving sort — see Polls.q22PollTrends
      .localCheckpoint(false)
      .orderBy("o_orderkey")
  }

  /** q44 — array/lambda family over grouped orders: collect + sort +
    * distinct + lambda filter + slice + membership, serialized as strings
    * (arrayFilter/arrayJoin/ANY patterns, §2.8). */
  def q44ArrayFamily(t: T): DataFrame =
    t.orders
      .groupBy("o_custkey")
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n_orders"),
        size(filter(collect_list(col("o_totalprice")), x => x > 200000))
          .as("n_big"),
        array_contains(collect_set(col("o_orderstatus")), "F").as("has_f"),
        array_join(slice(sort_array(collect_list(col("o_totalprice")), asc = false), 1, 3), ",")
          .as("top3"))
      .orderBy("o_custkey")

  /** q56 — ILIKE-chain classification with unicode folding (P7,
    * stg_dawum_institutes.sql:18-45 institute ratings; umlaut folding per
    * clustering.py:128-133 as column ops). German-ish labels are built
    * from literals so the fold is exercised on real umlauts. */
  def q56IlikeClassify(t: T): DataFrame =
    t.part
      .withColumn("label",
        concat(
          when(col("p_partkey") % 3 === 0, "Güteklasse ")
            .when(col("p_partkey") % 3 === 1, "Maßarbeit ")
            .otherwise("Größe "),
          col("p_type")))
      .withColumn("folded",
        translate(regexp_replace(lower(col("label")), "ß", "ss"), "äöü", "aou"))
      .withColumn("rating",
        when(col("label").ilike("%güte%"), "premium")
          .when(col("label").ilike("%maß%"), "custom")
          .when(col("folded").ilike("%grosse%"), "sized")
          .otherwise("standard"))
      .withColumn("type_class",
        when(col("p_type").ilike("%anodized%"), "coated")
          .when(col("p_type").ilike("%polished%"), "finished")
          .otherwise("raw"))
      .select("p_partkey", "label", "folded", "rating", "type_class")
      .orderBy("p_partkey")

  /** q45 — text search with pipe-separated alternatives
    * (storage/postgres.py:884-919): per-alternative ILIKE filter, UNION,
    * physical-row dedup on the identity tuple, first-matching-alternative
    * retained. */
  def q45SearchPipeAlts(t: T): DataFrame = {
    val alts = Seq("red", "blue", "small") // "red|blue|small"
    val frames = alts.zipWithIndex.map { case (a, i) =>
      t.part
        .filter(lower(col("p_name")).contains(a))
        .select(col("p_partkey"), col("p_name"),
          lit(i).as("alt_idx"), lit(a).as("alt"))
    }
    frames.reduce(_ unionByName _)
      .groupBy("p_partkey", "p_name")
      .agg(
        min("alt_idx").as("first_alt"),
        count(lit(1)).as("n_alts"),
        array_join(sort_array(collect_set(col("alt"))), ",").as("alts_matched"))
      .orderBy("p_partkey")
  }
}
