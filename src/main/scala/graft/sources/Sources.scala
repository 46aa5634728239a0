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
