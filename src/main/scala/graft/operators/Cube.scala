package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Serve._

/** JSON-stat 2.0 N-dimensional cube decode — the reference's signature
  * dataflow operator (study_scraper/jsonstat.py:30-109,
  * connectors/eurostat_connector.py:436-541).
  *
  * Decode is pure column arithmetic: row-major strides from the `size`
  * array, per-dimension index = (linear div stride_i) % size_i. The sparse
  * form ({"linearIndex": value}) explodes from a map; the dense form would
  * posexplode a list — both land in the same decode expression. No UDFs, no
  * driver loops; the decode is embarrassingly parallel over payload rows,
  * which is exactly what a 100 TB corpus of stat-office payloads needs
  * (one payload per dataset row, each decoding independently).
  */
object Cube {

  val payloadSchema: StructType = StructType(Seq(
    StructField("size", ArrayType(IntegerType)),
    StructField("value", MapType(StringType, DoubleType))))

  /** Decode a DataFrame with a JSON-stat `payload` string column into one
    * row per (cell, value) with a `dims` array of per-dimension indices.
    * Malformed payloads (from_json → null) and non-numeric linear keys are
    * skipped, mirroring jsonstat.py's unresolvable-cell skip. */
  def decodeSparse(payloads: DataFrame): DataFrame =
    payloads
      .withColumn("parsed", from_json(col("payload"), payloadSchema))
      // size > 0 guards the dims transform: a degenerate 0-dimensional
      // cube would make sequence(0, -1) DESCEND in Spark and size[-1]
      // throw under ANSI (the r14-advice BPE bug class); such a payload
      // has no addressable cells, so skipping it mirrors the
      // unresolvable-cell skip
      .filter(col("parsed").isNotNull && col("parsed.size").isNotNull &&
        size(col("parsed.size")) > 0)
      .select(col("parsed.size").as("size"),
        explode(map_entries(col("parsed.value"))).as("cell"))
      // try_cast, not cast: ANSI mode (Spark 4 default) errors on a
      // non-numeric linear key instead of skipping the cell
      .withColumn("idx", expr("try_cast(cell.key AS INT)"))
      .filter(col("idx").isNotNull)
      .withColumn("val", col("cell.value"))
      // stride_i = product of the sizes to the right of dimension i;
      // dim_i = (idx div stride_i) % size_i  (row-major, jsonstat.py:100-103)
      .withColumn("dims", expr(
        """transform(sequence(0, size(size) - 1), i ->
          |  CAST((idx div aggregate(slice(size, i + 2, size(size) - i - 1),
          |                          1, (a, x) -> a * x)) % size[i] AS INT))""".stripMargin))
      .select("idx", "val", "dims")

  val densePayloadSchema: StructType = StructType(Seq(
    StructField("size", ArrayType(IntegerType)),
    StructField("value", ArrayType(DoubleType))))

  /** Dense-form decode: `value` is a row-major list, position IS the
    * linear index (jsonstat.py's dense branch). Null cells (JSON-stat's
    * elision) are dropped like unresolvable sparse cells. */
  def decodeDense(payloads: DataFrame): DataFrame =
    payloads
      .withColumn("parsed", from_json(col("payload"), densePayloadSchema))
      // size > 0: same degenerate-cube guard as decodeSparse
      .filter(col("parsed").isNotNull && col("parsed.size").isNotNull &&
        size(col("parsed.size")) > 0)
      .select(col("parsed.size").as("size"),
        posexplode(col("parsed.value")).as(Seq("idx", "val")))
      .filter(col("val").isNotNull)
      .withColumn("dims", expr(
        """transform(sequence(0, size(size) - 1), i ->
          |  CAST((idx div aggregate(slice(size, i + 2, size(size) - i - 1),
          |                          1, (a, x) -> a * x)) % size[i] AS INT))""".stripMargin))
      .select("idx", "val", "dims")

  /** q37 — build a 3×2×12 sparse JSON-stat payload from lineitem
    * aggregates (returnflag × linestatus × shipmonth), then decode it back
    * through the generic decoder and re-attach category labels. The oracle
    * computes the flat cube directly — decode(encode(x)) must equal x. */
  def q37JsonstatDecode(t: T): DataFrame = {
    val rfIdx = when(col("l_returnflag") === "A", 0)
      .when(col("l_returnflag") === "N", 1).otherwise(2)
    val lsIdx = when(col("l_linestatus") === "F", 0).otherwise(1)
    val cells = t.lineitem
      .groupBy(rfIdx.as("rf"), lsIdx.as("ls"),
        (month(col("l_shipdate")) - 1).as("m"))
      .agg(round(sum("l_quantity"), 2).as("v"))
      .select(
        (col("rf") * 24 + col("ls") * 12 + col("m")).cast("string").as("k"),
        col("v"))
    val payload = cells
      .agg(to_json(struct(
        array(lit(3), lit(2), lit(12)).as("size"),
        map_from_entries(sort_array(collect_list(struct(col("k"), col("v")))))
          .as("value"))).as("payload"))
    decodeSparse(payload)
      .select(
        element_at(col("dims"), 1).as("rf_idx"),
        element_at(col("dims"), 2).as("ls_idx"),
        (element_at(col("dims"), 3) + 1).as("ship_month"),
        col("val"))
      .withColumn("returnflag",
        when(col("rf_idx") === 0, "A").when(col("rf_idx") === 1, "N").otherwise("R"))
      .withColumn("linestatus", when(col("ls_idx") === 0, "F").otherwise("O"))
      .select("returnflag", "linestatus", "ship_month", "val")
      .smallSort("returnflag", "linestatus", "ship_month")
  }

  /** A11 finding weight (aggregate.py:36-51): recency half-life of 3 years
    * against the corpus watermark, times sqrt(sample/1000) clamped to
    * [0.3, 3.0] — small samples never vanish, huge ones never dominate. */
  def pollWeight(pollDate: org.apache.spark.sql.Column,
                 today: org.apache.spark.sql.Column,
                 sample: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pow(lit(0.5), (datediff(today, pollDate) / lit(365.25)) / lit(3.0)) *
      least(lit(3.0), greatest(lit(0.3), sqrt(sample / lit(1000.0))))

  /** q38 — poll-of-polls weighted aggregation (A11,
    * study_scraper/aggregate.py:36-51,94-175): recency half-life weight
    * (3 "years" here = 1095 days against the corpus watermark) times a
    * clamped sqrt(sample/1000) size weight, grouped per party. The weighted
    * mean divides raw sums and rounds once at the end — the ratio is stable
    * to summation order, the raw sums are not. */
  def q38PollOfPolls(t: T): DataFrame = {
    val stg = Polls.stgPollResultsTable(t)
    // watermark recorded at staging time (Polls.stgWatermark — same value
    // as the orders ⋉ lineitem semi scan this used before staging became
    // a real table; every staged poll has ≥1 line by construction),
    // folded in as a literal: one pass over the staged table, no agg
    // pre-pass + broadcast join.
    val weighted = stg
      .withColumn("w",
        pollWeight(col("poll_date"), lit(Polls.stgWatermark(t)), col("surveyed")))
    weighted
      .groupBy("party")
      .agg(
        round(sum(col("w") * col("pct")) / sum("w"), 4).as("weighted_pct"),
        min("pct").as("min_pct"),
        max("pct").as("max_pct"),
        count(lit(1)).as("n_findings"),
        min(year(col("poll_date"))).as("min_year"),
        max(year(col("poll_date"))).as("max_year"),
        round(sum("surveyed"), 2).as("total_sample"))
      .smallSort("party")
  }
}
