package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, MapType, StringType}
import graft.Serve._

/** The reference's signature poll pipeline, re-expressed Spark-first.
  *
  * Mirrors the dbt chain raw → staging → marts:
  *  - raw_dawum_polls.sql:10-30     (projection, null/validity predicates)
  *  - stg_dawum_polls.sql:29,54-63  (JSONExtract Map + arrayJoin unpivot)
  *  - stg_dawum_polls.sql:90-115    (quality flags + row hash)
  *  - fact_polls.sql:50-102         (dim joins + lag/moving-average windows)
  *  - latest_poll_standings.sql:18-95 (argMax latest, FILTER aggs, share-of-
  *    total window, global rank)
  *
  * The poll corpus is derived deterministically from the shipped star schema
  * (orders = polls, lineitem rows = per-party results, customer = institute
  * dim) so the DuckDB oracle can recompute every value from the same parquet.
  * The JSON document round-trip (to_json → from_json → explode(map_entries))
  * is real: the staging path only sees a JSON string column, exactly like the
  * reference sees the DAWUM `Results` payload.
  *
  * Scale notes (100 TB): the unpivot is a narrow map-side transform (no
  * shuffle); windows partition by (party, institute) — thousands of keys, not
  * 7 — so no partition is ever a scale cliff; the institute dim join is an
  * explicit broadcast; the standings output is post-aggregate (one row per
  * party), so its single-partition share window is over a handful of rows.
  */
object Polls {

  private val resultsSchema = MapType(StringType, DoubleType)

  /** Raw poll documents: one row per poll, `results` is a JSON object
    * `{party: pct}` — the shape of the DAWUM `Results` map
    * (study_scraper/sources/dawum.py:3-11, FIXTURES.md §1). */
  def rawPolls(t: T): DataFrame = {
    // l_linenumber repeats within an order, so party pct is the SUM of its
    // line quantities (map keys must be unique). sort_array makes map key
    // order deterministic before to_json — collect_list order is not
    // guaranteed after a shuffle.
    val results = t.lineitem
      .groupBy(
        col("l_orderkey"),
        concat(lit("p"), col("l_linenumber")).as("party"))
      .agg(sum("l_quantity").as("pct"))
      .groupBy("l_orderkey")
      .agg(to_json(map_from_entries(sort_array(
        collect_list(struct(col("party"), col("pct")))))).as("results"))
    t.orders
      .join(results, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderkey").isNotNull && col("results") =!= "") // P2
      .select(
        col("o_orderkey").as("poll_id"),
        col("o_custkey").as("institute_id"),
        col("o_orderdate").as("poll_date"),
        col("o_totalprice").as("surveyed"),
        col("results"))
  }

  /** Staging: parse the JSON map, unpivot to one row per (poll, party),
    * attach validity flag + quality tier + deterministic row hash.
    * from_json(...).isNotNull is the isValidJSON predicate
    * (stg_dawum_polls.sql:31-32). The hash input uses pct scaled to an
    * integer (2-dp money semantics) so both engines hash identical text —
    * no double-to-string formatting dependency. */
  def stgPollResults(t: T): DataFrame =
    rawPolls(t)
      .withColumn("rmap", from_json(col("results"), resultsSchema))
      .filter(col("rmap").isNotNull)
      .select(
        col("poll_id"), col("institute_id"), col("poll_date"), col("surveyed"),
        explode(map_entries(col("rmap"))).as("entry"))
      .select(
        col("poll_id"), col("institute_id"), col("poll_date"), col("surveyed"),
        col("entry.key").as("party"),
        col("entry.value").as("pct"))
      .withColumn("pct_valid", col("pct") >= 0 && col("pct") <= 100)
      .withColumn("quality_tier",
        when(col("pct") < 10, "fringe")
          .when(col("pct") < 25, "minor")
          .when(col("pct") < 45, "major")
          .otherwise("landslide"))
      .withColumn("row_hash",
        sha2(concat_ws("|",
          col("poll_id"), col("party"),
          round(col("pct") * 100, 0).cast("long")), 256))

  /** The staging model MATERIALIZED, with dbt-table semantics: the
    * reference's `stg_dawum_polls` is a *table* (dbt_project/models/
    * staging/stg_dawum_polls.sql — materialization `table`, not
    * ephemeral), and its fact/serving models query that table. Mirroring
    * that, the unpivot chain is written once per (JVM, sf dir) as parquet
    * partitioned by `party` — the key every downstream window/aggregate
    * hashes on — and q21/q22/q23/q38 read the table instead of each
    * re-running the two staging shuffles + JSON round-trip.
    *
    * At 100 TB this is exactly the warehouse shape: staging lands
    * partitioned on the serving key, downstream reads prune/cluster by
    * it, and the expensive parse pays once per ingest, not per query. */
  def stgPollResultsTable(t: T): DataFrame =
    stagingCache.computeIfAbsent((t.spark, t.sfDir), { _ =>
      graft.SessionCaches.arm(t.spark)
      // Materialized as an EAGER 32-way localCheckpoint clustered on the
      // (party, institute) serving key, not as a parquet round-trip (r8.3).
      // The r7/r8.2 form wrote the table partitionBy(party): the rows
      // dictionary-compress to <1 MB on disk, so AQE coalesced the write
      // to ONE task and the read-back packed the tiny files into ~one
      // scan task (4 MB open-cost bins) — every downstream aggregate then
      // decoded ~0.5 M rows serially, 0.3-0.5 s per staging CONSUMER at
      // sf0.1, the dominant q22/q23 cost. The checkpoint stores decoded
      // rows in 32 partitions (same treatment as Tables.cpuHeavyKeys):
      // consumers skip the scan+decode entirely, and the preserved
      // HashPartitioning(party, institute_id) satisfies the clustered
      // distribution of q22's trend window and q23's per-party aggregate,
      // so their exchanges vanish too. At 100 TB this is the bucketed
      // staging table a warehouse would land (the dbt `table`
      // materialization of stg_dawum_polls) — bucket pruning + co-located
      // reads replace the in-memory blocks; nothing downstream changes.
      stgPollResults(t)
        .repartition(t.spark.sparkContext.defaultParallelism,
          col("party"), col("institute_id"))
        .localCheckpoint()
    })
  private val stagingCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), DataFrame]()
  graft.SessionCaches.onStop(s => stagingCache.keySet.removeIf(_._1 eq s): Unit)
  graft.SessionCaches.registerHolder(s => stagingCache.keySet.stream().anyMatch(_._1 eq s))

  /** Corpus watermark (max poll_date) recorded WHEN the staging table
    * materializes, not recomputed per consumer: a real staging job writes
    * its high-water mark to the metadata store in the same transaction as
    * the data (the shape streaming/Incremental.scala uses for its ledger),
    * so serving queries read a scalar instead of re-scanning the staged
    * table for one max. Collapses q23's and q38's two staged-table passes
    * to one each (r10 ask #4); the 1-row head() is the same
    * contract-bounded driver read as the streaming watermark. Keyed and
    * evicted with the staging cache. */
  def stgWatermark(t: T): java.sql.Timestamp =
    watermarkCache.computeIfAbsent((t.spark, t.sfDir), { _ =>
      stgPollResultsTable(t).agg(max("poll_date").as("d")).head().getTimestamp(0)
    })
  private val watermarkCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), java.sql.Timestamp]()
  graft.SessionCaches.onStop(s => watermarkCache.keySet.removeIf(_._1 eq s): Unit)
  graft.SessionCaches.registerHolder(s => watermarkCache.keySet.stream().anyMatch(_._1 eq s))

  /** q21 — the staging unpivot itself (the reference's highest-traffic
    * transform; every poll row flows through it). */
  def q21PollUnpivot(t: T): DataFrame =
    stgPollResultsTable(t).orderBy("poll_id", "party")

  /** q22 — fact layer: institute dim join + per-(party, institute) trend
    * windows (lag + 3-poll moving average + direction bucketing). */
  def q22PollTrends(t: T): DataFrame = {
    val institutes = t.customer.select(
      col("c_custkey"),
      col("c_name").as("institute_name"),
      col("c_mktsegment").as("institute_group"))
    val w = Window.partitionBy("party", "institute_id")
      .orderBy(col("poll_date"), col("poll_id"))
    stgPollResultsTable(t)
      .join(broadcast(institutes), col("institute_id") === col("c_custkey"))
      .withColumn("prev_pct", lag("pct", 1).over(w))
      // raw (unrounded) delta drives the bucket compare: the subtraction is
      // bit-identical in both engines; the rounded column is display-only.
      .withColumn("delta", round(col("pct") - col("prev_pct"), 2))
      .withColumn("ma3",
        round(sum("pct").over(w.rowsBetween(-2, 0)), 2) /
          count(lit(1)).over(w.rowsBetween(-2, 0)))
      .withColumn("trend",
        when(col("prev_pct").isNull, "new")
          .when(col("pct") - col("prev_pct") > 2.0, "up")
          .when(col("pct") - col("prev_pct") < -2.0, "down")
          .otherwise("stable"))
      .select("poll_id", "party", "institute_name", "institute_group",
        "pct", "prev_pct", "delta", "ma3", "trend")
      // No checkpoint before the serving sort (r8.2): under AQE the range
      // sort's sampling reads the window's ALREADY-materialized shuffle
      // output — the join + windows run once either way — so the earlier
      // localCheckpoint only added a second 1 M-row materialization
      // (measured +0.5 s warm; the "4× without" note predated the AQE
      // advisory sizing that created this shuffle boundary).
      .orderBy("poll_id", "party")
  }

  /** q23 — serving layer: per-party latest standings with recency-windowed
    * FILTER aggregates, previous-poll value, share-of-total among majors,
    * and a global rank (latest_poll_standings.sql:18-95). */
  def q23PollStandings(t: T): DataFrame = {
    // The corpus watermark is the scalar recorded at staging time
    // (stgWatermark) — the same value as the reference's max order date
    // among orders with at least one line — folded in as a literal, so
    // this query makes ONE pass over the staged table instead of an agg
    // pass plus a broadcast-join pass.
    val in180 =
      col("poll_date") >= lit(stgWatermark(t)) - expr("INTERVAL 180 DAYS")
    // Latest AND previous poll per party are picked in ONE aggregation
    // pass by the native `max2` aggregate (a constant two-slot buffer —
    // functions/Max2.scala): a row_number window over partitionBy(party)
    // is a full per-party sort — locally the dominant cost (each task
    // sorts ~85 k rows at sf0.1), and at 100 TB a skew cliff by
    // construction (billions of rows funneled through 7 partitions) —
    // while the r8.1 two-aggregate form (max, then max over rows strictly
    // below it) re-scanned the whole staging table for the second slot.
    // struct comparison is lexicographic and (date, id) is unique per
    // party, so max2.first/.second are exactly the (date desc, id desc)
    // latest/previous recency picks, partial-aggregated map-side.
    val agg1 = stgPollResultsTable(t)
      .groupBy("party")
      .agg(
        expr("max2(struct(poll_date, poll_id, pct))").as("m12"),
        count(lit(1)).as("n_polls"),
        countDistinct("institute_id").as("n_institutes"),
        (round(sum(when(in180, col("pct"))), 2) /
          count(when(in180, 1))).as("avg_180d"),
        round(stddev_pop(when(in180, col("pct"))), 4).as("volatility_180d"))
    val perParty = agg1
      .select(
        col("party"),
        col("m12.first.pct").as("latest_pct"),
        col("m12.first.poll_date").as("latest_date"),
        col("m12.second.pct").as("prev_pct"),
        col("n_polls"), col("n_institutes"),
        col("avg_180d"), col("volatility_180d"))
    // Post-aggregate: one row per party, so the whole-frame share window
    // runs over a handful of rows by design.
    val wAll = Window.partitionBy()
    perParty
      .withColumn("share_pct",
        col("latest_pct") * lit(100.0) /
          round(sum(when(col("latest_pct") >= 10, col("latest_pct"))).over(wAll), 2))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("latest_pct").desc, col("party").asc)))
      .select("rank", "party", "latest_pct", "latest_date", "prev_pct",
        "n_polls", "n_institutes", "avg_180d", "volatility_180d", "share_pct")
      .smallSort("rank")
  }
}
