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
}
