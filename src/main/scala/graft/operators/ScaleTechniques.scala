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
}
