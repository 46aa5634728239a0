package graft

import graft.Tables.T
import graft.operators.TypedPipeline
import org.apache.spark.sql.functions._

class TypedPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = T(spark, "/root/testdata/sf0.001")

  test("typed staging seam round-trips the DataFrame rows losslessly") {
    val ds = TypedPipeline.pollResults(t)
    assert(ds.count() == graft.operators.Polls.stgPollResults(t).count())
    val r = ds.filter(_.poll_id >= 0).head()
    assert(r.party.startsWith("p"))
  }

  test("typed Aggregator matches the column-expression weighted mean") {
    val ds = TypedPipeline.pollResults(t)
    val today = java.sql.Date.valueOf(
      ds.toDF().agg(date_format(max("poll_date"), "yyyy-MM-dd"))
        .collect()(0).getString(0))
    val typed = TypedPipeline.weightedByParty(spark, ds, today)
      .toDF("party", "weighted_pct")
      .withColumn("weighted_pct", round(col("weighted_pct"), 6))
      .orderBy("party").collect()
    val w = graft.operators.Cube.pollWeight(col("poll_date"), lit(today), col("surveyed"))
    val exprBased = ds.toDF()
      .withColumn("w", w)
      .groupBy("party")
      .agg(round(sum(col("w") * col("pct")) / sum("w"), 6).as("weighted_pct"))
      .orderBy("party").collect()
    assert(typed.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      exprBased.map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }

  test("zero-weight group yields NaN, not a crash") {
    val d = java.sql.Date.valueOf("2024-01-01")
    val ds = Seq(
      TypedPipeline.PollResult(1, 1, "px", 10.0, 0.0,
        java.time.LocalDateTime.parse("2024-01-01T00:00:00"))).toDS()
    // clamp floor 0.3 keeps w > 0 normally; force zero via clamp (0, 0)
    // (today = poll_date so the recency factor is exactly 1.0)
    val out = TypedPipeline.weightedByParty(spark, ds, d, 0.0, 0.0).collect()
    assert(out.head._2.isNaN)
  }
}
