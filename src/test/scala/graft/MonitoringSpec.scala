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
}
