package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** MEASURED I/O pruning on real files (scratch tooling — r16 verdict
  * item 2, the storage analogue of the skew rehearsal): the
  * `writePartitionedSorted` layout was pinned at plan level only (the
  * partition filter reaches the scan) and q141's bloom skipping is an
  * in-query simulation — at 100 TB scan pruning is the dominant lever
  * and no cell exercised it on real files. This probe writes the 30×
  * events corpus twice:
  *
  *   - FLAT: the corpus as shipped (32 unsorted files, no layout).
  *   - PRUNED: day partitions (clustered to one file each) + user_id
  *     sort within, 256 KB row groups, right-sized parquet blooms on
  *     user_id AND the non-sort event_id — the reference's PARTITION
  *     BY toYYYYMM + ORDER BY key instinct
  *     (sql/create_dataset_topics_table.sql:15-16; the 30-day corpus
  *     buckets by day so the partition count stays realistic).
  *
  * and measures REAL scan metrics (numFiles / filesSize / numOutputRows
  * read from the executed FileSourceScanExec, wall time min-of-3) for
  * a day-point predicate (directory pruning), key-point predicates
  * (row-group stats under the sort; bloom alone on the non-sort key),
  * and an absent key, against the flat layout's same logical queries.
  * SCALE.md I/O section records the cells and the two layout-authoring
  * findings (cluster-before-partitionBy; per-row-group NDV sizing).
  *
  *   sbt "runMain graft.ScaleGen 30 /tmp/graft_sf3"
  *   sbt "runMain graft.IoPruneProbe"
  */
object IoPruneProbe {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/tmp/graft_sf3"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val flatDir = s"$root/events.parquet"
    val prunedDir = "/tmp/graft_io_pruned"
    val events = spark.read.parquet(flatDir)
    if (!new java.io.File(s"$prunedDir/_SUCCESS").exists()) {
      // CLUSTER BY the partition column before the partitioned write:
      // without the repartition every upstream task writes every day
      // (32×30 = 960 small files here), and the default bloom NDV
      // (1M) writes a ~1 MB bloom PER FILE — the naive layout came
      // out 17× larger than the data (measured; SCALE.md I/O note).
      // One file per day + an NDV sized to the key universe is the
      // ingest discipline the 100 TB table needs.
      operators.ScaleTechniques.writePartitionedSorted(
        events.withColumn("day", date_format(col("ts"), "yyyyMMdd"))
          .repartition(col("day")),
        prunedDir, "day", Seq("user_id"),
        Map("parquet.bloom.filter.enabled#user_id" -> "true",
          // expected NDV is PER ROW GROUP: a 1 MB group holds ~17k
          // rows ≈ 700 distinct users (sorted) / 17k distinct events —
          // sizing to the column's global cardinality writes
          // megabyte blooms per group and bloats the table (first
          // attempt measured 17× the data; SCALE.md I/O note)
          "parquet.bloom.filter.expected.ndv#user_id" -> "2000",
          // the NON-sort lookup key: min/max stats are useless for it
          // (user-sorted row groups have wide event_id ranges), so a
          // point lookup prunes by bloom ALONE — the honest bloom cell
          "parquet.bloom.filter.enabled#event_id" -> "true",
          "parquet.bloom.filter.expected.ndv#event_id" -> "20000",
          "parquet.block.size" -> (1 << 18).toString))
      println(s"[ioprune] wrote pruned layout to $prunedDir")
    }

    // probe points: a mid-corpus day and a user active on it
    val day = events.select(date_format(col("ts"), "yyyyMMdd").as("d"))
      .groupBy("d").count().orderBy("d")
      .collect().map(_.getString(0)).apply(10)
    val key = events.filter(date_format(col("ts"), "yyyyMMdd") === day)
      .select("user_id").limit(1).collect()(0).getLong(0)
    println(s"[ioprune] probe day=$day key=$key")

    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    def cell(name: String, mk: () => DataFrame): Unit = {
      mk().collect() // warm (footers + page cache on both layouts)
      var df: DataFrame = null
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df = mk(); df.collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val ss = scans(df.queryExecution.executedPlan)
      val files = ss.map(s => s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
      val bytes = ss.map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
      val rows = ss.map(s => s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
      println(f"[ioprune] $name%-28s ${best}%6.3fs files=$files%-4d " +
        f"readMB=${bytes / 1024.0 / 1024.0}%8.2f scanRows=$rows%-9d")
    }

    val flat = spark.read.parquet(flatDir)
    val pruned = spark.read.parquet(prunedDir)
    // day-point: partition pruning vs full scan with the ts predicate
    cell("flat  day-point", () => flat
      .filter(date_format(col("ts"), "yyyyMMdd") === day)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    cell("pruned day-point", () => pruned
      .filter(col("day") === day)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    // key-point: bloom + sort row-group skipping vs full scan
    cell("flat  key-point", () => flat
      .filter(col("user_id") === key)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    cell("pruned key-point", () => pruned
      .filter(col("user_id") === key)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    // key-point inside one day: both levers compose
    cell("pruned day+key", () => pruned
      .filter(col("day") === day && col("user_id") === key)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    // absent key: the corpus key universe is DENSE, so the only absent
    // keys are out-of-range — which row-group min/max stats zero on
    // EITHER layout (measured scanRows=0 on flat too); in-range
    // absence needs a sparse domain (content hashes), noted in SCALE.md
    val absent = 49999L
    cell("flat  absent-key", () => flat
      .filter(col("user_id") === absent)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    cell("pruned absent-key", () => pruned
      .filter(col("user_id") === absent)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    // point lookup on the NON-sort key: stats skip nothing (row groups
    // sorted by user_id carry wide event_id ranges) — any pruning here
    // is the BLOOM's work alone
    val eid = events.filter(date_format(col("ts"), "yyyyMMdd") === day)
      .select("event_id").limit(1).collect()(0).getLong(0)
    cell("flat  eventid-point", () => flat
      .filter(col("event_id") === eid)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))
    cell("pruned eventid-point", () => pruned
      .filter(col("event_id") === eid)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")))

    // value identity: the layouts must answer identically
    val a = flat.filter(col("user_id") === key)
      .agg(count(lit(1)), round(sum("value"), 2)).collect()(0)
    val b = pruned.filter(col("user_id") === key)
      .agg(count(lit(1)), round(sum("value"), 2)).collect()(0)
    require(a.getLong(0) == b.getLong(0) &&
      math.abs(a.getDouble(1) - b.getDouble(1)) <= 0.011,
      s"layouts diverge: $a vs $b")
    println("[ioprune] layouts value-identical: ok")
    spark.stop()
  }
}
