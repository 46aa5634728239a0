package graft.operators

import graft.Tables.T
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Serve._

/** Core relational operators from SURVEY.md §2.2–§2.8, re-expressed as
  * declarative DataFrame plans over the synthetic star schema.
  *
  * Determinism rules (every query here is hash-compared against a DuckDB
  * oracle, SURVEY.md §5):
  *  - every output ends in a total ORDER BY over a unique key set;
  *  - double aggregates are rounded at a scale where the true decimal value
  *    cannot sit on a rounding boundary (inputs are 2-dp money / quantity,
  *    so sums are exact at 2dp, products of two 2-dp columns at 4dp) —
  *    engine-order FP noise (~1e-9) can never flip the rounded value;
  *  - ratios divide two already-rounded doubles, so both engines divide
  *    bit-identical operands.
  *
  * Scale notes: groupBy columns here are low-cardinality (flags, types,
  * users) → partial aggregation collapses data map-side before the shuffle;
  * dimension joins are broadcast; the trailing orderBy exists only for the
  * verification dump (at 100 TB you'd drop it or write sorted-within-
  * partition output).
  */
object Relational {

  /** A1/A2/A4 — TPC-H Q1-style pricing summary (FILTER-agg family).
    * Mirrors dbt `daily_poll_averages.sql:18-42` aggregate shapes. */
  def q01PricingSummary(t: T): DataFrame =
    t.lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        count(lit(1)).as("cnt"),
        (round(sum("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        count(when(col("l_quantity") > 25, 1)).as("big_qty_cnt"))
      .smallSort("l_returnflag", "l_linestatus")

  /** A3 — weighted average `sum(v*w)/sum(w)` (daily_poll_averages.sql:26). */
  def q02WeightedAvg(t: T): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        (round(sum(col("l_extendedprice") * col("l_quantity")), 2) /
          round(sum(col("l_quantity")), 2)).as("wavg_price"),
        round(sum("l_quantity"), 2).as("total_qty"))
      .smallSort("l_returnflag")

  /** J1/O1 — fact⋈dim enrichment join + top-k. Dim side (customer) is
    * broadcastable at any scale where dims stay small. */
  def q03TopCustomers(t: T): DataFrame =
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)

  /** W7 — share-of-total (latest_poll_standings.sql:93-95). The segment
    * total comes from an aggregate re-joined by broadcast, NOT a
    * Window.partitionBy("c_mktsegment"): the segment count is a CONSTANT
    * (5) while the per-customer rows grow with the data, so the window
    * form funnels billions of rows through 5 partitions at scale — a skew
    * cliff for work a 5-row broadcast absorbs. (The windowed form of W7
    * stays exercised where it is shape-safe: q17/q23's whole-frame share
    * windows run over post-aggregate row counts bounded by the group
    * space.) */
  def q04MarketShare(t: T): DataFrame = {
    val perCust = t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(round(sum("o_totalprice"), 2).as("cust_rev"))
    val segTotals = perCust.groupBy("c_mktsegment")
      .agg(round(sum("cust_rev"), 2).as("seg_rev"))
    perCust
      .join(broadcast(segTotals), Seq("c_mktsegment"))
      .withColumn("share_pct", col("cust_rev") * lit(100.0) / col("seg_rev"))
      .select("c_mktsegment", "c_custkey", "cust_rev", "share_pct")
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** W1 — lag() previous-value trend (fact_polls.sql:69-77). */
  def q05LagTrend(t: T): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("prev_value", lag("value", 1).over(w))
      .filter(col("prev_value").isNotNull)
      .withColumn("delta", round(col("value") - col("prev_value"), 2))
      .select("event_id", "user_id", "value", "prev_value", "delta")
      .orderBy("event_id")
  }

  /** W2/W3 — moving average + rolling count over explicit ROWS frames
    * (fact_polls.sql:80-90, daily_poll_averages.sql:71-88). */
  def q06MovingAvg(t: T): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("ma7",
        round(sum("value").over(w.rowsBetween(-6, 0)), 2) /
          count(lit(1)).over(w.rowsBetween(-6, 0)))
      .withColumn("cnt30", count(lit(1)).over(w.rowsBetween(-29, 0)))
      .select("event_id", "user_id", "value", "ma7", "cnt30")
      .orderBy("event_id")
  }

  /** D1/W4 — latest-row-per-key (ReplacingMergeTree read-time semantics,
    * sql/create_dataset_topics_table.sql:14; row_number rn=1). */
  def q07LatestEventPerUser(t: T): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** W6 — nth_value(v, 2) previous poll (latest_poll_standings.sql:25-33).
    * Frame pinned to the whole partition — engines differ on the default. */
  def q08NthValue(t: T): DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val whole = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.events
      .withColumn("rn", row_number().over(order))
      .withColumn("prev_value", nth_value(col("value"), 2).over(whole))
      .filter(col("rn") === 1)
      .select("user_id", "value", "prev_value")
      .orderBy("user_id")
  }

  /** W5 — global ranking (latest_poll_standings.sql:87-90). Scale-safe
    * shape: distributed top-k first (TakeOrderedAndProject — each partition
    * keeps only its local top 100, the driver merges), THEN a global window
    * over the 100 surviving rows. The window never sees the base table, so
    * the "No Partition Defined" single-task scan of `customer` is gone. */
  def q09GlobalRank(t: T): DataFrame = {
    val ord = Seq(col("c_acctbal").desc, col("c_custkey").asc)
    val top = t.customer
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(ord: _*)
      .limit(100)
    top
      .withColumn("balance_rank", row_number().over(Window.orderBy(ord: _*)))
      .select("balance_rank", "c_custkey", "c_name", "c_acctbal")
      .smallSort("balance_rank")
  }

  /** J5 — semi + anti join composition (migrations/0011:21-31 queue rules:
    * EXISTS claims, NOT EXISTS attributions). */
  def q10SemiAnti(t: T): DataFrame = {
    // Single pass over orders: one shuffle computes both the EXISTS and the
    // NOT EXISTS branch as conditional aggregates, then one join back to
    // customer — vs the naive semi+anti pair that shuffles orders twice.
    val perCust = t.orders
      .groupBy("o_custkey")
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"))
      .filter(col("n_f") === 0) // grouped rows imply >=1 order (EXISTS)
    t.customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** U3 — UNION DISTINCT (follow.py:47-66, 3_Topic_Browser.py:454-462). */
  def q11UnionDistinct(t: T): DataFrame =
    t.customer.select(col("c_nationkey").cast("int").as("nationkey"))
      .union(t.supplier.select(col("s_nationkey").cast("int").as("nationkey")))
      .distinct()
      .smallSort("nationkey")

  /** A1/A5 — count + distinct count rollups (status.py:80-222). */
  def q12EventCounts(t: T): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .smallSort("event_type")

  /** A5/A10 — distinct count over tuples (topic_classifier.py:511,644). */
  def q13DistinctPairs(t: T): DataFrame =
    t.events
      .select("user_id", "event_type").distinct()
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_types"))
      .orderBy("user_id")

  /** A8 — exact quantiles (quantileExact 0.1/0.5/0.9,
    * 3_Topic_Browser.py:142-144). */
  def q14Percentiles(t: T): DataFrame =
    t.events
      .groupBy("event_type")
      .agg(
        round(percentile(col("value"), lit(0.1)), 4).as("p10"),
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"))
      .smallSort("event_type")

  /** A7 — mode with deterministic tie-break (anyHeavy equivalent;
    * 3_Topic_Browser.py:132). Expressed as count-then-rank so the
    * tie-break (highest count, then lowest user) is explicit. */
  def q15ModeTiebreak(t: T): DataFrame = {
    val counts = t.events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
    // The (cnt desc, user asc) winner per type is an AGGREGATE, not a
    // row_number window: event_type cardinality is constant while the
    // (type, user) rows grow with the data, so the window form sorts an
    // ever-growing partition per type at scale. min(struct(-cnt, user))
    // is the identical ordering — lexicographic struct comparison, cnt
    // negated to turn desc into asc — and partial-aggregates map-side;
    // cnt rides along in the third field ((−cnt, user) is already unique
    // per type, so it never influences the ordering).
    counts
      .groupBy("event_type")
      .agg(min(struct((-col("cnt")).as("neg_cnt"), col("user_id"),
        col("cnt"))).as("m"))
      .select(col("event_type"), col("m.user_id").as("user_id"),
        col("m.cnt").as("cnt"))
      .smallSort("event_type")
  }

  /** A4 — conditional aggregates over recency windows relative to the
    * dataset watermark (latest_poll_standings.sql:36-69, A9 watermark). */
  def q16RecencyBuckets(t: T): DataFrame = {
    val maxTs = t.events.agg(max("ts").as("max_ts"))
    t.events
      .crossJoin(broadcast(maxTs))
      .groupBy("user_id")
      .agg(
        count(when(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"), 1))
          .as("cnt_7d"),
        count(when(col("ts") >= col("max_ts") - expr("INTERVAL 30 DAYS"), 1))
          .as("cnt_30d"),
        count(lit(1)).as("cnt_all"),
        max("ts").as("last_seen"))
      .orderBy("user_id")
  }

  /** P4/P5/P6 — CASE bucketing + share-of-total (stg_dawum_polls.sql:90-104,
    * multiIf in create_datasets_unified_view.sql:8-16). */
  def q17PriceTiers(t: T): DataFrame = {
    val tiered = t.orders.withColumn("tier",
      when(col("o_totalprice") < 50000, "small")
        .when(col("o_totalprice") < 150000, "medium")
        .when(col("o_totalprice") < 300000, "large")
        .otherwise("jumbo"))
    tiered
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("volume"))
      .withColumn("share_pct",
        col("cnt") * lit(100.0) / sum("cnt").over(Window.partitionBy()))
      .smallSort("tier")
  }

  /** JSON path extraction (stg_dawum_polls.sql:29 JSONExtract; Postgres
    * `->>` in 0005:164-174). */
  def q18JsonExtract(t: T): DataFrame =
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .smallSort("k_bucket")

  /** Date-part derivations (fact_polls.sql:193-197 toYear/toMonth/...). */
  def q19DateParts(t: T): DataFrame =
    t.orders
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("volume"))
      .smallSort("o_year", "o_quarter", "o_month")

  /** §2.8 string family — trim/upper/lower/concat/length/replace
    * (stg_dawum_institutes.sql:11, create_datasets_unified_view.sql:9-14). */
  def q20StringFuncs(t: T): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("tag"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_slug"),
        substring(col("p_name"), 1, 8).as("name_prefix"))
      .orderBy("p_partkey")

  /** q107 — the distribution-rank window family (ntile / percent_rank /
    * cume_dist), completing §2.5 beyond lag/rows/range/rank/nth/share:
    * value quartiles and exact distribution positions per event type.
    * The (value, event_id) sort key is total (ids unique), so ranks are
    * tie-free and the ratios are bit-stable across engines: both sides
    * perform the IDENTICAL IEEE double division of the same integer
    * operands, so the raw doubles (and their shortest-roundtrip reprs)
    * match exactly — no round() layer, whose decimal HALF_UP-vs-
    * half-away tie behavior was the one cross-engine hazard (r11
    * advice). One shuffle on
    * event_type; at 100 TB this is the per-category score-calibration
    * pass (quantile bucketing a quality score before threshold tuning). */
  def q107RankFamily(t: T): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    t.events
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("event_id")
  }

  /** q104 — PIVOT: per-user event-type counts as columns. The value list
    * is PINNED (not discovered), which matters twice: semantically the
    * report schema is fixed, and physically Spark skips the extra
    * distinct-values job a `pivot(col)` without values would run — the
    * plan is one partial-aggregated shuffle on user_id, identical to a
    * FILTER-aggregate fan-out (which is exactly how the oracle replays
    * it). Missing combinations surface as count 0, not null. */
  def q104Pivot(t: T): DataFrame = pivotCounts(t.events)

  /** Pivot core over any (user_id, event_type) frame — public for the
    * spec's missing-combination corpus. */
  def pivotCounts(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = events
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("user_id") +:
        types.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
      .orderBy("user_id")
  }

  /** q105 — ROLLUP grouping sets: the (returnflag, linestatus) pricing
    * rollup with subtotal and grand-total rows, `grouping_id` telling the
    * levels apart. One shuffle: Spark expands the grouping sets map-side
    * (Expand) and partially aggregates before the exchange, so the
    * subtotal rows cost no extra pass over the fact table — the same
    * reason the reference's status rollups (A12) are single-scan. */
  def q105Rollup(t: T): DataFrame =
    t.lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty", "sum_price")
      .smallSort("gid", "l_returnflag", "l_linestatus")
}
