package graft

import graft.streaming.RoundTrip
import org.apache.spark.sql.functions._

/** The shared streaming round-trip scaffold: a run that commits ZERO
  * output files (empty input slice, or every window still open at
  * termination) must yield an EMPTY frame with the transform's schema —
  * not a schema-inference AnalysisException over a sink dir holding only
  * _spark_metadata (r12 advice fix: explicit schema on the readback). */
class RoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("empty input slice reads back as an empty frame with the transform's schema") {
    val in = Seq((1L, "a")).toDF("id", "v").filter(lit(false))
    val out = RoundTrip.run(spark, "graft_rt_spec_", Seq(in)) { ss =>
      ss.head.select(col("id"), upper(col("v")).as("v_up"))
    }
    assert(out.columns.toSeq == Seq("id", "v_up"))
    assert(out.count() == 0)
  }

  test("all-windows-open run (append mode, nothing released) is empty, not an error") {
    // One event, watermark delay far beyond the data span: the window is
    // never closed by the final no-data batch, so append mode emits
    // nothing and the sink commits no data file.
    val in = Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("ts", "n")
    val out = RoundTrip.run(spark, "graft_rt_spec_open_", Seq(in)) { ss =>
      ss.head.withWatermark("ts", "365 days")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum("n").as("total"))
        .select(col("window.start").as("w_start"), col("total"))
    }
    assert(out.columns.toSeq == Seq("w_start", "total"))
    assert(out.count() == 0)
  }
}
