package graft

import graft.operators.Cube
import org.apache.spark.sql.functions._

/** Weight-formula semantics ported from the reference's aggregation tests
  * (tests/study_scraper/test_aggregate.py:25-152: half-life behavior,
  * sample-size clamps). */
class PollWeightSpec extends SparkSpec {
  import spark.implicits._

  private def weight(daysOld: Int, sample: Double): Double =
    Seq((java.sql.Date.valueOf("2026-01-01"), daysOld, sample))
      .toDF("today", "days", "n")
      .withColumn("poll_date", expr("date_sub(today, days)"))
      .select(Cube.pollWeight(col("poll_date"), col("today"), col("n")).as("w"))
      .head().getDouble(0)

  test("a fresh 1000-person poll has weight 1") {
    assert(math.abs(weight(0, 1000.0) - 1.0) < 1e-9)
  }

  test("three years of age halves the weight") {
    val fresh = weight(0, 1000.0)
    val old3y = weight(1096, 1000.0) // 3 * 365.25 ≈ 1095.75 days
    assert(math.abs(old3y / fresh - 0.5) < 1e-3)
  }

  test("sample-size factor clamps at 0.3 below and 3.0 above") {
    assert(math.abs(weight(0, 1.0) - 0.3) < 1e-9)      // sqrt(0.001) << 0.3
    assert(math.abs(weight(0, 10000000.0) - 3.0) < 1e-9) // sqrt(10000) >> 3
  }

  test("weight is monotonic in sample size within the clamp band") {
    val w1 = weight(0, 500.0)
    val w2 = weight(0, 2000.0)
    assert(w1 < 1.0 && w2 > 1.0 && w1 < w2)
  }
}
