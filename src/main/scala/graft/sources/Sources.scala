package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DateType, StructType, TimestampType}

/** File sources and the CSV dataset export sink.
  *
  *  - S7 file loader (elt/loader_clickhouse.py:284-337): csv/json/parquet
  *    picked by extension, explicit schema only — no inference in
  *    production paths (SURVEY.md §1.3).
  *  - S10 CSV dataset export (study_scraper/export.py:45-86): list columns
  *    join with '|', timestamps ISO-formatted, header on, plus a
  *    manifest.json carrying row counts — the reference's
  *    findings.csv/studies.csv/manifest.json product.
  *  - S11 seeds: readCsv with an explicit schema covers dbt seed loading.
  */
object Sources {

  /** S7 — extension-dispatched load with a required explicit schema for
    * text formats (parquet carries its own). */
  def loadFile(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    // extension comes from the basename only: "/data/v1.2/events" has no
    // extension, not extension "2/events"
    val base = path.stripSuffix("/").split('/').last
    val ext = base.lastIndexOf('.') match {
      case i if i > 0 && i < base.length - 1 => base.substring(i + 1).toLowerCase
      case _ => throw new IllegalArgumentException(
        s"no file extension on '$path' — expected .csv/.json/.jsonl/.ndjson/.parquet")
    }
    def required: StructType = schema.getOrElse(throw new IllegalArgumentException(
      s".$ext requires an explicit schema — no inference in production paths (SURVEY.md §1.3)"))
    ext match {
      case "parquet" => spark.read.parquet(path)
      case "csv" =>
        spark.read.option("header", "true").schema(required).csv(path)
      case "json" | "jsonl" | "ndjson" =>
        spark.read.schema(required).json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported extension .$other (csv/json/parquet)")
    }
  }

  /** S3 — Destatis chunked-CSV merge (connectors/destatis_connector.py:
    * 739-762 `_merge_csv_chunks`): large cube downloads arrive in chunks
    * that each repeat the header row; the merge keeps the FIRST chunk's
    * header, drops every later header, and skips blank/empty chunks.
    * Input: (chunk_idx, payload) string rows; output: one row per
    * surviving CSV line in (chunk, line) order, header first — feed it to
    * loadFile/from_csv with the cube's explicit schema downstream. */
  def mergeCsvChunks(chunks: DataFrame): DataFrame =
    chunks
      .select(col("chunk_idx"),
        posexplode(split(trim(col("payload")), "\n")).as(Seq("line_idx", "line")))
      .filter(col("line_idx") > 0 || col("chunk_idx") === 0)
      .filter(trim(col("line")) =!= "")
      .orderBy("chunk_idx", "line_idx")
      .select("line")

  /** q114 — the S10 export sink as a DECLARED round-trip (r11 ask #5):
    * export a deterministic events slice (array column → '|' join,
    * timestamp → ISO string) through the real exportCsv, then read the
    * CSV back with an explicit all-string schema (pathGlobFilter keeps
    * the manifest out of the scan) and the manifest.json counters back
    * from disk. The oracle recomputes the formatted strings and the
    * manifest row count straight from the parquet table, so the hash
    * pins the writer's formatting AND the manifest contents. The
    * manifest frame is one row — the crossJoin is the broadcast-1-row
    * pattern the plan audit allowlists. Scratch is keyed by a
    * per-invocation run id (the q101/q110 treatment): a new invocation's
    * overwrite can never race a previously returned frame's readback. */
  def q114ExportManifest(t: graft.Tables.T): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val spark = t.spark
    val slice = t.events
      .filter(col("event_id") % 100 === 0)
      .select(col("event_id"), col("ts"),
        array(col("event_type"), concat(lit("u"), col("user_id"))).as("tags"))
    val outDir = graft.TmpDirs.fresh("graft_q114_", t.sfDir)
    Sources.exportCsv(slice, outDir)
    val schema = StructType(Seq("event_id", "ts", "tags")
      .map(org.apache.spark.sql.types.StructField(_, StringType)))
    val back = spark.read
      .option("header", "true").option("pathGlobFilter", "*.csv")
      .schema(schema).csv(outDir)
    val man = spark.read.text(outDir + "/manifest.json").select(
      regexp_extract(col("value"), "\"rows\": (\\d+)", 1)
        .cast("long").as("manifest_rows"),
      regexp_extract(col("value"), "\"columns\": (\\d+)", 1)
        .cast("long").as("manifest_columns"))
    import graft.Serve.ServingOps
    back.crossJoin(broadcast(man))
      .smallSort(col("event_id").cast("long"))
  }

  /** q115 — S3 Destatis chunk merge as a DECLARED query: chunk payloads
    * built deterministically from documents rows (each chunk repeats the
    * header; chunk 0 carries a mid-payload blank line; an all-blank
    * chunk rides along), merged by the real mergeCsvChunks — the oracle
    * is simply header-once + the data lines, which is the semantics
    * under test (connectors/destatis_connector.py:739-762). */
  def q115CsvChunks(t: graft.Tables.T): DataFrame = {
    import t.spark.implicits._
    val data = t.documents.filter(col("doc_id") < 40)
      .select((col("doc_id") % 4).as("chunk_idx"),
        concat_ws(";", col("doc_id"), col("n_chars")).as("l"))
    val chunks = data.groupBy("chunk_idx")
      .agg(concat(
        lit("id;n_chars\n"),
        when(col("chunk_idx") === 0, lit("\n")).otherwise(lit("")),
        array_join(array_sort(collect_list(col("l"))), "\n"),
        lit("\n")).as("payload"))
      .unionByName(Seq((4L, "   ")).toDF("chunk_idx", "payload"))
    mergeCsvChunks(chunks)
  }

  /** S10 — CSV export: arrays → '|' joins, timestamps/dates → ISO strings,
    * one header-ed CSV directory per call; returns the exported row count
    * (the manifest datum). Column order is preserved. */
  def exportCsv(df: DataFrame, outDir: String): Long = {
    val flattened = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: ArrayType =>
          acc.withColumn(f.name, concat_ws("|", col(f.name)))
        case TimestampType =>
          acc.withColumn(f.name,
            date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss"))
        case DateType =>
          acc.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd"))
        case _ => acc
      }
    }
    val n = flattened.count()
    flattened.write.mode("overwrite").option("header", "true").csv(outDir)
    // manifest.json beside the export (export.py:74-86)
    val manifest = s"""{"rows": $n, "columns": ${df.columns.length}}"""
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(outDir, "manifest.json"), true)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    n
  }
}
