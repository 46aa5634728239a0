package graft.operators

import graft.Tables.T
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed pipeline seams — SURVEY.md §7.0: `Dataset[T]` with case-class
  * encoders where type safety matters (the Study/Claim/Finding record
  * shapes of study_scraper/models.py), and a typed `Aggregator` for the
  * weighted-mean semantics (the Aggregator option SURVEY §2.14 notes for
  * A11/A14).
  *
  * The DataFrame API remains the default currency everywhere else — typed
  * seams buy compile-time schema safety at pipeline boundaries without
  * leaving Catalyst (case-class encoders are still Tungsten rows; the
  * Aggregator compiles to a regular physical aggregate).
  */
object TypedPipeline {

  /** The poll×party record at the staging seam (stg_dawum_polls shape).
    * `poll_date` is `LocalDateTime` — the native encoder for the parquet
    * TIMESTAMP_NTZ column, decoded with no timezone conversion at all, so
    * the wall-clock day is host-TZ-independent (a `java.sql.Timestamp`
    * field would upcast NTZ→TIMESTAMP through the session zone and then
    * convert back through the JVM default zone, which only cancels when
    * those two zones agree). */
  final case class PollResult(
      poll_id: Long, institute_id: Long, party: String,
      pct: Double, surveyed: Double, poll_date: java.time.LocalDateTime)

  /** A finding after weighting (aggregate.py:36-51 weight inputs). */
  final case class WeightedFinding(party: String, pct: Double, w: Double)

  /** Typed weighted-mean aggregator: Σ(w·pct)/Σw. */
  object WeightedMean extends Aggregator[WeightedFinding, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), f: WeightedFinding): (Double, Double) =
      (b._1 + f.w * f.pct, b._2 + f.w)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** The staging rows as a typed Dataset (schema checked at compile time
    * against the case class, not at runtime against strings). */
  def pollResults(t: T): Dataset[PollResult] = {
    val spark = t.spark
    import spark.implicits._
    Polls.stgPollResults(t)
      .select(
        col("poll_id"), col("institute_id"), col("party"),
        col("pct"), col("surveyed"), col("poll_date"))
      .as[PollResult]
  }

  /** Typed poll-of-polls: weight per record, groupByKey(party), custom
    * Aggregator — same weight semantics as the column-expression q38 core
    * (Cube.pollWeight): recency half-life of 3 years against `today`,
    * times sqrt(sample/1000) clamped to [lo, hi]. */
  def weightedByParty(spark: SparkSession, ds: Dataset[PollResult],
                      today: java.sql.Date,
                      sizeClampLo: Double = 0.3,
                      sizeClampHi: Double = 3.0): Dataset[(String, Double)] = {
    import spark.implicits._
    val todayEpoch = today.toLocalDate.toEpochDay
    ds.map { r =>
        // truncate to the wall-clock calendar day — no TZ math anywhere,
        // matching what datediff() sees on any host.
        val pollDay = r.poll_date.toLocalDate.toEpochDay
        val ageDays = (todayEpoch - pollDay).toDouble
        val recency = math.pow(0.5, (ageDays / 365.25) / 3.0)
        val size = math.min(sizeClampHi,
          math.max(sizeClampLo, math.sqrt(r.surveyed / 1000.0)))
        WeightedFinding(r.party, r.pct, recency * size)
      }
      .groupByKey(_.party)
      .agg(WeightedMean.toColumn.name("weighted_pct"))
  }
}
