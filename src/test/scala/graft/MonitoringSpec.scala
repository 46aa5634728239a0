package graft

import graft.operators.Monitoring
import org.apache.spark.sql.functions._

class MonitoringSpec extends SparkSpec {
  import spark.implicits._

  test("watch prune: keys off the keep-list deactivate, none are deleted") {
    val registry = Seq(("w1", true), ("w2", true), ("w3", false))
      .toDF("watch_key", "active")
    val keep = Seq("w1", "w3").toDF("watch_key")
    val out = Monitoring.pruneWatches(registry, keep, "watch_key")
      .orderBy("watch_key").collect()
    assert(out.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("w1", true), ("w2", false), ("w3", true)))
  }

  test("compaction keeps exactly the latest version per key") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"),
      (2L, 1L, "x")).toDF("key", "version", "payload")
    val out = Monitoring.compact(df, Seq("key"), "version")
      .orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "c"), (2L, "x")))
  }

  test("gap rules: stale / single-source / no-percentage flags compose") {
    val df = Seq(
      ("c1", 2020, 1, 0, 5, 2026),  // stale + single source + no pct
      ("c2", 2025, 3, 4, 5, 2026))  // healthy
      .toDF("cluster", "latest_year", "n_sources", "n_pct", "n_total", "cur_year")
    val out = Monitoring.gapFlags(df).orderBy("cluster").collect()
    assert(out(0).getAs[Boolean]("has_gap"))
    assert(out(0).getAs[Boolean]("stale"))
    assert(!out(1).getAs[Boolean]("has_gap"))
  }

  test("digest renders shifts and new entries as markdown") {
    val rows = Seq(
      ("party a", 31.5, 25.0, "shift"),
      ("party b", 12.0, 12.5, "stable"),
      ("new question", 40.0, 0.0, "new"))
      .toDF("label", "cur_value", "prev_value", "status").collect()
    val md = Monitoring.renderDigest("Weekly digest", rows.toSeq)
    assert(md.contains("# Weekly digest"))
    assert(md.contains("**party a**: 31.5 (+6.5)"))
    assert(!md.contains("party b"))
    assert(md.contains("- new question: 40.0"))
  }

  test("empty digest says so") {
    val rows = Seq(("x", 1.0, 1.0, "stable"))
      .toDF("label", "cur_value", "prev_value", "status").collect()
    assert(Monitoring.renderDigest("D", rows.toSeq).contains("No significant changes."))
  }

  test("gap report renders the reference's markdown table per topic") {
    val rows = Seq(
      ("klima", "frage 1", 10L, 3L, Integer.valueOf(2024), "—"),
      ("klima", "frage 2", 4L, 1L, Integer.valueOf(2019),
        "stale (last 2019), single source"),
      ("rente", "frage 9", 2L, 2L, null.asInstanceOf[Integer], "undated"))
      .toDF("topic", "cluster_label", "n_findings", "n_institutes",
        "latest", "gaps").collect()
    val md = Monitoring.renderGapReport(rows.toSeq)
    assert(md.startsWith("# Evidence-gap report"))
    assert(md.contains("## Topic: `klima`"))
    assert(md.contains("| question cluster | findings | institutes | latest | gaps |"))
    // sorted by findings desc within topic
    assert(md.indexOf("frage 1") < md.indexOf("frage 2"))
    assert(md.contains("| frage 2 | 4 | 1 | 2019 | stale (last 2019), single source |"))
    assert(md.contains("| frage 9 | 2 | 2 | — | undated |"))
  }

  test("gap report without rows points at the attribute stage") {
    assert(Monitoring.renderGapReport(Seq.empty)
      .contains("No attributed topics yet"))
  }

  test("dossier renders summary, detail table, deduped citations, sources") {
    val summary = Seq(
      ("tempolimit einführen", "support", 58.4, 3L, 52.0, 63.0,
        Integer.valueOf(2022), Integer.valueOf(2024),
        java.lang.Double.valueOf(4500.0)),
      ("tempolimit einführen", "oppose", 36.1, 1L, 36.1, 36.1,
        Integer.valueOf(2024), Integer.valueOf(2024),
        null.asInstanceOf[java.lang.Double]))
      .toDF("label", "position", "weighted_pct", "n_findings", "min_pct",
        "max_pct", "year_min", "year_max", "total_sample").collect()
    val details = Seq(
      ("tempolimit einführen", 63.0, "support", Integer.valueOf(2024),
        java.lang.Long.valueOf(1500L), "", "Forsa", "https://x.org/a", 0.9),
      ("tempolimit einführen", 52.0, "support", Integer.valueOf(2022),
        null.asInstanceOf[java.lang.Long], "ost", "Allensbach",
        "https://x.org/b", 0.55),
      ("tempolimit einführen", 36.1, "oppose", Integer.valueOf(2024),
        java.lang.Long.valueOf(1500L), "", "Forsa", "https://x.org/a", 0.8))
      .toDF("label", "percentage", "position", "pub_year", "sample_n",
        "population", "institute", "canonical_url", "confidence").collect()
    val md = Monitoring.renderDossier("tempolimit", summary.toSeq, details.toSeq)
    assert(md.startsWith("# Research dossier: “tempolimit”"))
    assert(md.contains("- support: **58.4%** (3 polls, spread 52–63%, 2022–2024, Σn=4,500)"))
    // single poll: no spread bit, no Σn when absent
    assert(md.contains("- oppose: **36.1%** (1 poll, 2024)"))
    // citation [1] reused for the same url; [2] for the second
    assert(md.contains("| 63.0% | support | 2024 | 1,500 | — | Forsa [1] | 0.90 |"))
    assert(md.contains("| 52.0% | support | 2022 | — | ost | Allensbach [2] | 0.55 |"))
    assert(md.contains("| 36.1% | oppose | 2024 | 1,500 | — | Forsa [1] | 0.80 |"))
    assert(md.contains("## Method & caveats"))
    assert(md.contains("1. Forsa, 2024. <https://x.org/a>"))
    assert(md.contains("2. Allensbach, 2022. <https://x.org/b>"))
  }

  test("dossier with no findings is a short valid document") {
    val md = Monitoring.renderDossier("x", Seq.empty, Seq.empty, Some(2020))
    assert(md.contains("**No findings matched.**"))
    assert(md.contains("findings from 2020 onward"))
  }
}
