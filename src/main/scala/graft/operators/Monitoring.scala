package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Serve._

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
  def compact(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    compact(df, keyCols, Seq(col(versionCol).desc))

  /** Compaction with an explicit (multi-column) version ordering — ties on
    * a single version column would make "latest" nondeterministic, so real
    * jobs pass a total order (e.g. ts DESC, id DESC). */
  def compact(df: DataFrame, keyCols: Seq[String],
              orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** q82 — the D1 compaction JOB end-to-end as a declared query (r9 ask:
    * the write-time maintenance path was spec-only; every other D1 check
    * rides the read-time window). One pass: read the versioned table,
    * keep the latest row per (user_id, event_type) under a total order
    * (ts DESC, event_id DESC tie-break), REWRITE the table to parquet,
    * and read the rewritten table back — the OPTIMIZE FINAL semantics of
    * elt/loader_clickhouse.py:253-282 as a periodic Spark job.
    *
    * 100 TB shape: exactly one shuffle (the window on the compaction
    * keys), then a straight columnar write. A production table is
    * partitioned (by date/source); the same job runs with
    * partitionOverwriteMode=dynamic so only partitions that received new
    * versions since the last compaction are rewritten, and the readback
    * scan keeps pruning + pushdown. The readback here is the point of the
    * declared query: the oracle recomputes the window analytically while
    * Spark proves the round-trip (write → footer schema → scan) preserves
    * the compacted state byte-for-byte. */
  def q82Compaction(t: graft.Tables.T): DataFrame = {
    val spark = t.spark
    val compacted = compact(t.events, Seq("user_id", "event_type"),
      Seq(col("ts").desc, col("event_id").desc))
    // JVM-scoped scratch keyed by sf dir AND a per-invocation run id
    // (r12, the q101/q110 treatment): a repeated bench/verify pass's
    // overwrite can never race a previously returned frame's readback,
    // the compacted slice is MBs so per-rep growth is trivial, and the
    // shutdown hook removes the whole tree on exit.
    val outDir = graft.TmpDirs.fresh("graft_q82_", s"${t.sfDir}/events_compacted")
    compacted.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
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

  /** q63 — the composed status-page rollup (status.py:80-222): per
    * source×topic coverage counting only `kept` studies user-facing,
    * pending/rejected surfaced via FILTER aggregates alongside, plus the
    * per-source run classification with the #48 aborted rule — a run is
    * failed when errors > 0 OR (finished_at IS NULL AND notes starts
    * 'aborted:'); a healthy in-progress run (finished_at NULL, no aborted
    * note) is NOT failed. One groupBy per grain, broadcast join on the
    * tiny source key, share-of-source via a window over the aggregate. */
  def q63StatusRollup(t: graft.Tables.T): DataFrame = {
    // source is doc_id % 20 in the synthetic corpus, so per-study
    // attributes derive from doc_id div 20 — the value that VARIES within
    // a source (a %-derived attribute would be constant per source)
    val k = expr("doc_id div 20")
    val studies = t.documents.select(
      col("doc_id"), col("source"),
      when(k % 4 === 0, "scans")
        .when(k % 4 === 1, "joins")
        .when(k % 4 === 2, "sorting")
        .otherwise("tuning").as("topic_id"),
      when(k % 10 < 7, "kept")
        .when(k % 10 < 9, "pending")
        .otherwise("rejected").as("status"),
      (k % 3 === 0).as("has_quant"))
    val perST = studies
      .groupBy("source", "topic_id")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("status") === "kept", 1)).as("n_kept"),
        count(when(col("status") === "pending", 1)).as("n_pending"),
        count(when(col("status") === "rejected", 1)).as("n_rejected"),
        count(when(col("status") === "kept" && col("has_quant"), 1))
          .as("n_quant_kept"))
      .withColumn("kept_share_of_source",
        expr("CAST(n_kept AS DOUBLE)") /
          sum("n_kept").over(Window.partitionBy("source")))
    val runs = t.documents.select(
        col("source"),
        when(k % 7 === 0, 1).otherwise(0).as("errors"),
        (k % 9 === 0).as("fin_null"),
        when(k % 9 === 0 && k % 2 === 0,
          "aborted: 401").otherwise("").as("notes"))
      .withColumn("aborted", col("fin_null") && col("notes").startsWith("aborted:"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_runs"),
        count(when(col("errors") === 0 && !col("aborted"), 1)).as("n_success"),
        count(when(col("errors") > 0 || col("aborted"), 1)).as("n_failed"))
    perST
      .join(broadcast(runs), Seq("source"))
      .smallSort("source", "topic_id")
  }

  /** q64 — the evidence-gap report's table body (dossier.py:228-294) as a
    * declared query: per (topic, question-cluster) finding counts,
    * institute breadth, latest publication year, and the gap flags in the
    * reference's order — undated / "stale (last Y)" (cut = watermark year
    * − 3), "single source", "no percentages" — joined ', ' with '—' when
    * clean. The watermark year comes from a light scan, not a second
    * reference to the aggregate subtree. */
  def q64GapReport(t: graft.Tables.T): DataFrame = {
    val cut = t.events.agg((max(year(col("ts"))) - 3).as("stale_cut"))
    // gap conditions are cluster-correlated so each flag genuinely fires:
    // clusters 0-4 publish 5 years back (stale), cluster 7 has a single
    // institute, cluster 9 carries no percentages, %11 rows are undated
    val findings = t.events.select(
      col("event_type").as("topic"),
      concat(lit("frage "), col("event_id") % 25).as("cluster_label"),
      concat(lit("inst"),
        when(col("event_id") % 25 === 7, lit(0))
          .otherwise(col("user_id") % 5)).as("institute"),
      when(col("event_id") % 11 === 0, lit(null))
        .otherwise(year(col("ts")) -
          when(col("event_id") % 25 < 5, 5).otherwise(0)).as("pub_year"),
      (col("event_id") % 4 =!= 0 && col("event_id") % 25 =!= 9).as("has_pct"))
    findings
      .groupBy("topic", "cluster_label")
      .agg(
        count(lit(1)).as("n_findings"),
        countDistinct("institute").as("n_institutes"),
        max("pub_year").as("latest"),
        count(when(col("has_pct"), 1)).as("n_pct"))
      .crossJoin(broadcast(cut))
      .withColumn("gaps", expr(
        """coalesce(nullif(array_join(filter(array(
          |  CASE WHEN latest IS NULL THEN 'undated'
          |       WHEN latest < stale_cut THEN concat('stale (last ', latest, ')')
          |  END,
          |  CASE WHEN n_institutes = 1 THEN 'single source' END,
          |  CASE WHEN n_pct = 0 THEN 'no percentages' END),
          |  g -> g IS NOT NULL), ', '), ''), '—')""".stripMargin))
      .select("topic", "cluster_label", "n_findings", "n_institutes",
        "latest", "gaps")
      .smallSort(col("topic"), col("n_findings").desc, col("cluster_label"))
  }

  /** The evidence-gap report PRODUCT (dossier.py:228-294
    * `build_gap_report`): q64's aggregate rows rendered to the reference's
    * Markdown shape — preamble, per-topic section, the five-column table,
    * em-dash placeholders. Driver-side formatting over a handful of
    * aggregate rows, like renderDigest. */
  def renderGapReport(rows: Seq[Row]): String = {
    val sb = new StringBuilder("# Evidence-gap report\n\n")
    sb.append(
      "_Which questions have polling data, how fresh, how broadly " +
        "sourced — and where the holes are._\n\n")
    if (rows.isEmpty)
      return sb.append("**No attributed topics yet** — run the pipeline " +
        "through `attribute` first.\n").toString
    rows.groupBy(_.getAs[String]("topic")).toSeq.sortBy(_._1).foreach {
      case (topic, members) =>
        sb.append(s"## Topic: `$topic`\n\n")
        sb.append("| question cluster | findings | institutes | latest | gaps |\n")
        sb.append("|------------------|-----------|------------|--------|------|\n")
        members.sortBy(r =>
            (-r.getAs[Long]("n_findings"), r.getAs[String]("cluster_label")))
          .foreach { r =>
            val latest = Option(r.getAs[Integer]("latest")).fold("—")(_.toString)
            sb.append(s"| ${r.getAs[String]("cluster_label")} " +
              s"| ${r.getAs[Long]("n_findings")} " +
              s"| ${r.getAs[Long]("n_institutes")} " +
              s"| $latest | ${r.getAs[String]("gaps")} |\n")
          }
        sb.append("\n")
    }
    sb.toString
  }

  private val methodNote =
    "Aggregates are weighted means per question cluster: weight = " +
      "recency (3-year half-life on publication date) × sqrt(n/1000) " +
      "clamped to [0.3, 3]; undated studies are heavily discounted. " +
      "Question clustering is lexical-semantic (v1) and can over- or " +
      "under-group; every underlying finding is listed so the grouping " +
      "is checkable. Findings are machine-extracted from study text; " +
      "extraction errors are possible — follow the links before citing."

  /** The research-dossier PRODUCT (dossier.py:52-146 `build_dossier`):
    * summary bullets per (cluster, position) from the poll-of-polls
    * aggregate (q38's weight semantics), detail tables newest-first with
    * URL-deduped citation numbering, the method note, and the numbered
    * source list. Driver-side formatting over aggregate rows, bounded by
    * the answer count like renderDigest.
    *
    * @param summary rows (label, position, weighted_pct, n_findings,
    *                min_pct, max_pct, year_min, year_max, total_sample)
    * @param details rows (label, percentage, position, pub_year, sample_n,
    *                population, institute, canonical_url, confidence)
    *                — pre-sorted newest-first within label by the caller
    */
  def renderDossier(query: String, summary: Seq[Row], details: Seq[Row],
                    since: Option[Int] = None): String = {
    val sb = new StringBuilder(s"# Research dossier: “$query”\n\n")
    val scope = since.fold("all ingested findings")(y => s"findings from $y onward")
    sb.append(s"_Generated from the attribution layer; $scope._\n\n")
    if (summary.isEmpty)
      return sb.append("**No findings matched.** Either no ingested study " +
        "answers this question, or the attribution pass hasn't covered it " +
        "yet (see the evidence-gap report).\n").toString
    sb.append("## Summary — what the polls say\n\n")
    summary.groupBy(_.getAs[String]("label")).toSeq.sortBy(_._1).foreach {
      case (label, positions) =>
        sb.append(s"**$label**\n\n")
        positions.sortBy(_.getAs[String]("position")).foreach { p =>
          val n = p.getAs[Long]("n_findings")
          val bits = Seq(s"$n poll${if (n != 1) "s" else ""}") ++
            (if (n > 1)
              Seq(f"spread ${p.getAs[Double]("min_pct")}%.0f–${p.getAs[Double]("max_pct")}%.0f%%")
            else Nil) ++
            Option(p.getAs[Integer]("year_min")).map { yMin =>
              val yMax = p.getAs[Integer]("year_max")
              if (yMin == yMax) yMax.toString else s"$yMin–$yMax"
            }.toSeq ++
            Option(p.getAs[java.lang.Double]("total_sample"))
              .map(t => f"Σn=${t.toLong}%,d").toSeq
          sb.append(f"- ${p.getAs[String]("position")}: " +
            f"**${p.getAs[Double]("weighted_pct")}%.1f%%** (${bits.mkString(", ")})\n")
        }
        sb.append("\n")
    }
    sb.append("## Findings in detail\n\n")
    val citations = scala.collection.mutable.LinkedHashMap.empty[String, Row]
    details.groupBy(_.getAs[String]("label")).toSeq.sortBy(_._1).foreach {
      case (label, members) =>
        sb.append(s"### $label\n\n")
        sb.append("| % | position | year | n | population | institute / source | conf |\n")
        sb.append("|---|----------|------|---|------------|--------------------|------|\n")
        members.foreach { m =>
          val url = Option(m.getAs[String]("canonical_url"))
          url.foreach(u => if (!citations.contains(u)) citations(u) = m)
          val ref = url.fold("—")(u => s"[${citations.keysIterator.indexOf(u) + 1}]")
          val year = Option(m.getAs[Integer]("pub_year")).fold("—")(_.toString)
          val nStr = Option(m.getAs[java.lang.Long]("sample_n"))
            .fold("—")(v => f"${v.toLong}%,d")
          val conf = Option(m.getAs[java.lang.Double]("confidence"))
            .fold("—")(c => f"${c.toDouble}%.2f")
          sb.append(f"| ${m.getAs[Double]("percentage")}%.1f%% " +
            s"| ${m.getAs[String]("position")} | $year | $nStr " +
            s"| ${Option(m.getAs[String]("population")).filter(_.nonEmpty).getOrElse("—")} " +
            s"| ${m.getAs[String]("institute")} $ref | $conf |\n")
        }
        sb.append("\n")
    }
    sb.append("## Method & caveats\n\n").append(methodNote).append("\n\n")
    sb.append("## Sources\n\n")
    citations.values.zipWithIndex.foreach { case (c, i) =>
      val year = Option(c.getAs[Integer]("pub_year")).fold("—")(_.toString)
      sb.append(s"${i + 1}. ${c.getAs[String]("institute")}, $year. " +
        s"<${c.getAs[String]("canonical_url")}>\n")
    }
    sb.append("\n").toString
  }

  /** q111 — M3 watch prune as a DECLARED query (r11 ask #5: the last
    * spec-only components get oracle rows): the watch registry is every
    * user with their event count; the keep-list is users with ≥1
    * purchase; pruneWatches left-joins and flips `active` — flag flip,
    * not delete, exactly storage/postgres.py:1408-1463. Both sides are
    * one aggregate; the join is key-clustered — at 100 TB the registry
    * join is a broadcast (keep-lists are small by construction). */
  def q111WatchPrune(t: graft.Tables.T): DataFrame = {
    val registry = t.events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val keep = t.events
      .filter(col("event_type") === "purchase")
      .select("user_id")
    pruneWatches(registry, keep, "user_id")
      .smallSort("user_id")
  }

  /** q112 — the M4 DIGEST PRODUCT (digest.py:190-249) end-to-end: a
    * per-watch day-over-day aggregate (cur = max event day, prev = the
    * day before), status classification (new / shift / steady), then the
    * REAL renderDigest over the collected rows — driver-side formatting
    * over a bounded watch list (≤ 5×29 labels by construction), which is
    * the reference's own contract for this product. The oracle replays
    * aggregate + classification + the exact Markdown assembly in SQL
    * (string_agg over the same label order), so the rendered bytes are
    * hash-pinned, not just the aggregate beneath them. Counts are
    * integer-valued doubles, so the %.1f formatting has no FP-tie
    * hazard (the q107 advice class). */
  def q112DigestMarkdown(t: graft.Tables.T): DataFrame = {
    import t.spark.implicits._
    // calendar DATES, not dayofmonth (r12 advice): day numbers collide
    // across months in a multi-month corpus, and a max-day on the 1st
    // would make the prev filter (day - 1 = 0) match nothing
    val dd = t.events.agg(max(to_date(col("ts")))).head
      .getAs[java.sql.Date](0)
    val rows = t.events
      .select(concat(col("event_type"), lit("/u"), col("user_id") % 29).as("label"),
        to_date(col("ts")).as("d"))
      .groupBy("label")
      .agg(count(when(col("d") === lit(dd), 1)).cast("double").as("cur_value"),
        count(when(col("d") === date_sub(lit(dd), 1), 1)).cast("double")
          .as("prev_value"))
      .filter(col("cur_value") > 0)
      .withColumn("status",
        when(col("prev_value") === 0, "new")
          .when(col("cur_value") =!= col("prev_value"), "shift")
          .otherwise("steady"))
      .orderBy("label")
      .collect().toSeq
    Seq(renderDigest("Weekly digest", rows)).toDF("digest_md")
  }

  /** q113 — the M4 EVIDENCE-GAP PRODUCT (dossier.py:228-294): q64's
    * aggregate rows through the real renderGapReport — preamble,
    * per-topic sections sorted by topic, member rows by (findings DESC,
    * label), em-dash placeholders. Same bounded-driver-side contract and
    * oracle treatment as q112. */
  def q113GapMarkdown(t: graft.Tables.T): DataFrame = {
    import t.spark.implicits._
    Seq(renderGapReport(q64GapReport(t).collect().toSeq)).toDF("gap_md")
  }

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

  /** q135 — the HLL ROLLUP CUBE: fine-grain register sketches persisted
    * once, re-aggregated to any coarser grain without touching raw data
    * — the sketch-as-warehouse-primitive pattern that makes A12's
    * distinct rollups (status.py:80-222) viable at 100 TB. Per
    * (event_type, day) the RAW register file (`hll_regs`) is built in
    * one pass; the per-type total is then `hll_merge_regs` over those
    * 30 arrays ALONE — pointwise max, associative and idempotent, so
    * any merge tree (re-merging overlapping grains included) is exact.
    * The query pins the whole contract:
    * `merge_matches_direct` compares the rolled-up register file
    * register-for-register against a direct sketch of the same rows
    * (must be TRUE — the algebraic identity the pattern rests on), the
    * register summary/estimate are HOFs over the merged array (mirrored
    * by the oracle from the same md5 arithmetic), and the exact
    * count(DISTINCT) beside it is the verification column and the
    * deleted cost. At ~150 users per type the estimate takes the
    * linear-counting branch, q134's regime. */
  def q135HllRollup(t: graft.Tables.T): DataFrame = {
    // The sketched key is the ACTIVE USER-DAY (user:day) — the
    // DAU-style metric whose per-type cardinality genuinely varies on
    // this corpus (plain distinct users per type is the full 150-user
    // universe for every type — a degenerate identical-rows demo).
    val e = t.events.select(col("event_type"),
      concat(col("user_id").cast("string"), lit(":"),
        to_date(col("ts")).cast("string")).as("u"),
      to_date(col("ts")).as("day"))
    val daily = e.groupBy("event_type", "day")
      .agg(expr("hll_regs(u)").as("regs"))
    val rolled = daily.groupBy("event_type")
      .agg(expr("hll_merge_regs(regs)").as("mr"), count(lit(1)).as("n_days"))
    val direct = e.groupBy("event_type")
      .agg(expr("hll_regs(u)").as("dr"), countDistinct(col("u")).as("exact"))
    rolled.join(direct, Seq("event_type"))
      .withColumn("merge_matches_direct", col("mr") === col("dr"))
      .withColumn("n_zero", expr("size(filter(mr, x -> x = 0))"))
      .withColumn("sum_rho",
        expr("aggregate(mr, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("reg_fp", expr(
        "aggregate(zip_with(mr, sequence(1, 512), " +
          "(x, j) -> CAST(j AS BIGINT) * x), CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("z_scaled", expr(
        "aggregate(mr, CAST(0 AS BIGINT), " +
          "(a, x) -> a + shiftleft(CAST(1 AS BIGINT), 52 - x))"))
      .withColumn("est", HllEstimate.estimate(col("n_zero"), col("z_scaled")))
      .withColumn("ok", HllEstimate.okBound(col("est"), col("exact")))
      .select("event_type", "n_days", "merge_matches_direct", "n_zero",
        "sum_rho", "reg_fp", "z_scaled", "est", "exact", "ok")
      .smallSort("event_type")
  }
}
