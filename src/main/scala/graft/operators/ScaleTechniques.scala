package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-design techniques for the 100 TB target — SURVEY.md §4's
  * MergeTree-locality mapping, exercised and asserted in tests:
  *
  *  - **Bucketed co-located joins**: both sides written with `bucketBy` on
  *    the join key join WITHOUT a shuffle (the ClickHouse ORDER-BY-key
  *    locality equivalent). At 100 TB this converts the nightly fact⋈fact
  *    join from a full network shuffle into a map-side zip of bucket files.
  *  - **Skew salting**: explode the hot side's key space by a salt factor,
  *    replicate the small side per salt, aggregate away the salt — AQE
  *    handles moderate skew automatically; salting is the explicit fix for
  *    pathological keys (the reference's Destatis year-slicing instinct,
  *    connectors/destatis_connector.py:337-367, applied to joins).
  *  - **Partitioned, sorted writes**: `partitionBy(month)` +
  *    `sortWithinPartitions` ≈ PARTITION BY toYYYYMM + ORDER BY key
  *    (sql/create_dataset_topics_table.sql:15-16): partition pruning from
  *    the directory layout, min/max row-group skipping from the sort.
  */
object ScaleTechniques {

  /** Write both sides bucketed on the join key into the session warehouse;
    * subsequent joins on that key shuffle neither side. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for a skewed key: the big side gets a deterministic
    * salt from a secondary column, the small side is replicated across all
    * salt values; the join key becomes (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltCol: String, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(col(saltCol)), lit(salts)))
    val saltValues = small.sparkSession.range(salts)
      .select(col("id").cast("long").as("__salt"))
    val smallSalted = small.crossJoin(saltValues) // one copy per salt value
    salted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Partitioned + sorted write (partition pruning + row-group skipping). */
  def writePartitionedSorted(df: DataFrame, path: String,
                             partCol: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)

  /** Count shuffle exchanges in a DataFrame's executed plan (test probe). */
  def shuffleCount(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  /** q103 — the skew-salting technique as a declared round-trip: the
    * orders⋈customer join runs through [[saltedJoin]] (8-way salt on a
    * deterministic hash of the order key, customer side replicated per
    * salt), then aggregates per nation. Salting is semantics-neutral —
    * the oracle replays the PLAIN join+aggregate — but changes the
    * shuffle key from `custkey` to `(custkey, salt)`, splitting a
    * pathological hot customer across 8 reducers. AQE's skew-join
    * handles moderate cases automatically; explicit salting is the
    * 100 TB fix for a single key too hot for any one executor even
    * after AQE splits (ScaleTechniquesSpec pins salted == plain rows).
    */
  def q103SaltedJoin(t: graft.Tables.T): DataFrame = {
    import graft.Serve._
    saltedJoin(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      t.customer.select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
      "o_custkey", "o_orderkey", 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .smallSort("c_nationkey")
  }

  /** Per-JVM injective (sfDir → id) assignment for q101's catalog table
    * names (table identifiers can't carry a raw path). */
  private val sfIds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val sfIdSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  // Per-invocation run ids come from TmpDirs.nextRunId(): two concurrent
  // q101 executions (or a late re-execution of a previously returned
  // frame) must never share a table name/path with mode overwrite — a
  // write could race another run's read. Fresh names per call; the data
  // dirs live under the shutdown-swept scratch root and stay MBs-scale
  // across a bench's passes.

  /** q101 — the bucketed co-located join as a declared round-trip: write
    * orders and customer bucketed on the customer key (8 buckets, sorted
    * within) into catalog tables, then join the TABLES and aggregate
    * revenue per market segment. The join carries no Exchange on either
    * side — the bucket files ARE the shuffle output, paid once at write
    * time (ScaleTechniquesSpec asserts the zero-shuffle plan; the only
    * exchange in the whole query is the final 5-group aggregate). At
    * 100 TB this is the nightly fact⋈dim pattern: bucket both tables on
    * the join key at ingest and every downstream join of the pair skips
    * its network shuffle. EAGER like q82: construction writes the two
    * bucketed tables.
    *
    * Table names and external paths are keyed INJECTIVELY by the sf dir
    * (a per-JVM id assigned per distinct path — no lossy sanitization,
    * so two dirs differing only in punctuation can never collide) AND a
    * per-invocation run id (r12 advice: a concurrent execution, or a
    * late re-execution of a previously returned frame, must never race
    * another run's overwrite of a shared path); the data lives under
    * the JVM-scoped scratch root (shutdown-hook cleaned), NOT the
    * default warehouse in cwd.
    */
  def q101BucketedJoin(t: graft.Tables.T): DataFrame = {
    import graft.Serve._
    val spark = t.spark
    val run = graft.TmpDirs.nextRunId()
    val key = s"sf${sfIds.computeIfAbsent(t.sfDir, _ => sfIdSeq.incrementAndGet())}_r$run"
    val root = graft.TmpDirs.keyed("graft_q101_", s"${t.sfDir}#r$run")
    def write(df: DataFrame, name: String, bucketCol: String): String = {
      val table = s"graft_q101_${name}_$key"
      df.write.mode("overwrite")
        .bucketBy(8, bucketCol).sortBy(bucketCol)
        .option("path", s"$root/$name")
        .format("parquet")
        .saveAsTable(table)
      table
    }
    val ot = write(t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders", "o_custkey")
    val ct = write(t.customer.select("c_custkey", "c_mktsegment"),
      "customer", "c_custkey")
    spark.table(ot)
      .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .smallSort("c_mktsegment")
  }

  /** q137 — percentiles WITHOUT the global sort: p50/p90/p99 of line-item
    * price (integer cents) per return flag AND globally, read from the
    * mergeable `hist_sketch` quantile histogram
    * (`functions/HistSketch.scala`). The sketch leg is the 100 TB shape:
    * a 7.5 KiB buffer partial-aggregates map-side, one tiny shuffle of
    * (grain, cell) rows, and the cumulative walk runs over
    * post-aggregate-small cells. The global grain is NOT a second pass:
    * it is the per-flag sketches merged POINTWISE (cells summed by
    * position) — re-aggregation across grains exactly like q135's HLL
    * register rollup — and `merge_matches_direct` pins cell-for-cell
    * equality against a directly-computed global sketch.
    *
    * The EXACT percentiles beside the estimates come from sketch-GUIDED
    * selection, not a per-grain global sort: the cumulative walk yields,
    * for each quantile, the bucket holding rank ⌈q·n⌉ and the rank's
    * offset within it; a ≤12-row broadcast of (grain, bucket, offset)
    * then prunes the raw rows map-side to just the candidate buckets
    * (≈ the mass of three ≤6.25%-wide value slices), and only that
    * sliver is sorted. Identical to the naive rank walk BY CONSTRUCTION
    * (the rank-target value lies in its bucket: cum_before < target ≤
    * cum), which is exactly what the DuckDB oracle replays — so the
    * match is between two genuinely different algorithms. Each `okNN`
    * pins the geometry bound est ≤ exact ≤ est·17/16 in pure integer
    * arithmetic (exact·16 ≤ est·17 — no FP anywhere in the query).
    * Worst-case honesty: a single-bucket value distribution makes the
    * pruned sliver the whole grain — but then the sort's key domain is
    * one bucket's ≤1/16-relative width, and the adversary needs every
    * row inside it. Re-expresses the reference's summary percentile
    * reporting (study_scraper/status.py:80-222,
    * transform/polls.py:212-214) at sketch scale. */
  def q137HistQuantiles(t: graft.Tables.T): DataFrame =
    histQuantiles(t.lineitem)

  def histQuantiles(lineitem: DataFrame): DataFrame = {
    import graft.Serve._
    import org.apache.spark.sql.expressions.Window
    val vals = lineitem.select(col("l_returnflag").as("grain"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val perFlag = vals.groupBy("grain").agg(expr("hist_sketch(cents)").as("h"))
    val cells = perFlag.select(col("grain"),
      posexplode(col("h")).as(Seq("pos", "cnt")))
    // the pointwise merge IS the ALL grain — no second pass over raw rows
    val mergedAll = cells.groupBy("pos").agg(sum("cnt").as("cnt"))
      .withColumn("grain", lit("ALL"))
    val directAll = vals.groupBy().agg(expr("hist_sketch(cents)").as("h"))
      .select(posexplode(col("h")).as(Seq("pos", "dcnt")))
    val mergeOk = mergedAll.join(directAll, Seq("pos"))
      .agg(min(col("cnt") === col("dcnt")).as("merge_matches_direct"))
    val lb = expr("CASE WHEN pos < 32 THEN CAST(pos AS BIGINT) " +
      "ELSE shiftleft(CAST(pos % 16 + 16 AS BIGINT), pos DIV 16 - 1) END")
    // first bucket whose cumulative count reaches rank ⌈q·n⌉ always has
    // cnt > 0 (cum is non-decreasing), so zero cells never distort the
    // min() picks below; and because cum_before = cum − cnt is itself
    // non-decreasing, min(pos) and min(cum_before) over qualifying cells
    // both come from that same first bucket.
    val cum = cells.select("grain", "pos", "cnt")
      .unionByName(mergedAll.select("grain", "pos", "cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("grain").orderBy("pos")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("grain")))
      .withColumn("lb", lb)
    val quantiles = Seq( // (tag, ⌈q·n⌉ as integer arithmetic)
      ("p50", "(n + 1) DIV 2"),
      ("p90", "(n * 9 + 9) DIV 10"),
      ("p99", "(n * 99 + 99) DIV 100"))
    val estAggs = Seq(max("n").as("n"),
      sum(expr("(pos + 1) * cnt")).as("hist_fp")) ++
      quantiles.flatMap { case (tag, target) => Seq(
        min(when(col("cum") >= expr(target), col("lb"))).as(s"${tag}_est"),
        min(when(col("cum") >= expr(target), col("pos"))).as(s"${tag}_pos"),
        // the rank's offset inside its bucket: target − cum_before. MAX,
        // not min: cum_before grows with pos, so the offset DECREASES
        // across qualifying buckets and peaks at the first one (where it
        // is the only positive value — later buckets have cum_before ≥
        // target already)
        max(when(col("cum") >= expr(target),
          expr(target) - (col("cum") - col("cnt")))).as(s"${tag}_rk"))
      }
    val est = cum.groupBy("grain").agg(estAggs.head, estAggs.tail: _*)
    // ≤12-row guide: one (grain, bucket, in-bucket rank) per quantile
    val guide = est.select(col("grain"), expr(
      "explode(array(" + quantiles.map { case (tag, _) =>
        s"struct('$tag' AS tag, ${tag}_pos AS pos, ${tag}_rk AS rk)"
      }.mkString(", ") + ")) AS g")).select(col("grain"), col("g.*"))
    val posOf = expr("CASE WHEN cents < 32 THEN CAST(cents AS INT) " +
      "ELSE CAST((length(bin(cents)) - 5) * 16 + " +
      "shiftrightunsigned(cents, length(bin(cents)) - 5) AS INT) END")
    // map-side prune to candidate buckets, then sort only the sliver
    val hits = vals.unionByName(vals.withColumn("grain", lit("ALL")))
      .withColumn("pos", posOf)
      .join(broadcast(guide), Seq("grain", "pos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("grain", "tag").orderBy("cents")))
      .filter(col("rn") === col("rk"))
    val exactAggs = quantiles.map { case (tag, _) =>
      min(when(col("tag") === tag, col("cents"))).as(s"${tag}_exact")
    }
    val exact = hits.groupBy("grain").agg(exactAggs.head, exactAggs.tail: _*)
    def ok(e: String, x: String) = col(e) <= col(x) && col(x) * 16 <= col(e) * 17
    est.join(exact, Seq("grain"))
      .crossJoin(broadcast(mergeOk)) // 1-row scalar, the q16/q83 pattern
      .withColumn("ok50", ok("p50_est", "p50_exact"))
      .withColumn("ok90", ok("p90_est", "p90_exact"))
      .withColumn("ok99", ok("p99_est", "p99_exact"))
      .select("grain", "n", "p50_est", "p50_exact", "ok50", "p90_est",
        "p90_exact", "ok90", "p99_est", "p99_exact", "ok99", "hist_fp",
        "merge_matches_direct")
      .smallSort("grain")
  }
}
