package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monitoring products — the reference's watch/digest/gap layer plus the
  * write-time compaction job:
  *  - M3 watch registry prune (storage/postgres.py:1408-1463,
  *    questions.py:82-97): active set reconciled against a keep-list.
  *  - M4 digest rendering (digest.py:190-249): weighted aggregates →
  *    Markdown. Rendering is driver-side formatting over a HANDFUL of
  *    aggregate rows (never row-scale data).
  *  - Gap report rules (dossier.py:228-294): stale >3y, single source,
  *    no percentages, undated.
  *  - D1 write-time compaction (elt/loader_clickhouse.py:253-282 OPTIMIZE
  *    FINAL): rewrite a versioned table keeping the latest row per key.
  */
object Monitoring {

  /** M3 — prune: rows in `registry` whose key is absent from `keep` are
    * deactivated (flag flip, not delete — the reference keeps history). */
  def pruneWatches(registry: DataFrame, keep: DataFrame, keyCol: String): DataFrame =
    registry
      .join(keep.select(col(keyCol)).distinct().withColumn("__keep", lit(true)),
        Seq(keyCol), "left")
      .withColumn("active", col("__keep").isNotNull)
      .drop("__keep")

  /** D1 — compaction: latest version per key wins; the output is what a
    * ReplacingMergeTree table looks like after OPTIMIZE FINAL. Run as a
    * periodic job so read paths drop their window-dedup step. */
  def compact(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Gap rules (dossier.py:262-292) as a column expression bundle over a
    * per-cluster aggregate frame with (latest_year, n_sources, n_pct,
    * n_total, cur_year) columns. */
  def gapFlags(df: DataFrame): DataFrame =
    df
      .withColumn("stale", col("cur_year") - col("latest_year") > 3)
      .withColumn("single_source", col("n_sources") === 1)
      .withColumn("no_percentages", col("n_pct") === 0)
      .withColumn("has_gap",
        col("stale") || col("single_source") || col("no_percentages"))

  /** M4 — digest rendering: collected aggregate rows → Markdown. Expects
    * rows of (label, cur_value, prev_value, status); driver-side by
    * design, bounded by the number of watches. */
  def renderDigest(title: String, rows: Seq[Row]): String = {
    val sb = new StringBuilder(s"# $title\n\n")
    val shifts = rows.filter(_.getAs[String]("status") == "shift")
    val fresh = rows.filter(_.getAs[String]("status") == "new")
    if (shifts.isEmpty && fresh.isEmpty) sb.append("No significant changes.\n")
    if (shifts.nonEmpty) {
      sb.append("## Shifts\n\n")
      shifts.foreach { r =>
        val delta = r.getAs[Double]("cur_value") - r.getAs[Double]("prev_value")
        sb.append(f"- **${r.getAs[String]("label")}**: ${r.getAs[Double]("cur_value")}%.1f " +
          f"(${if (delta >= 0) "+" else ""}$delta%.1f)\n")
      }
    }
    if (fresh.nonEmpty) {
      sb.append("\n## New\n\n")
      fresh.foreach(r =>
        sb.append(f"- ${r.getAs[String]("label")}: ${r.getAs[Double]("cur_value")}%.1f\n"))
    }
    sb.toString
  }
}
