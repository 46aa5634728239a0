package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream watermarked interval join — the one Structured Streaming
  * join surface the q72/q92/q96/q98 state family leaves unexercised, and
  * the ingestion-time form of the q89 as-of attribution: match each view
  * event with every purchase by the same user within the following two
  * hours, as both streams arrive.
  *
  * This is the "join two live feeds" stage of an event-log curation
  * pipeline (reference `transform/mart/mart_clickstream.sql`-style
  * view→purchase attribution, here computed online instead of nightly).
  * Spark plans it as a `StreamingSymmetricHashJoin`: both sides shuffle on
  * `user_id`, each side buffers rows in keyed state, and the event-time
  * range condition (`purchase_ts` ∈ (`view_ts`, `view_ts` + 2h]) plus the
  * two watermarks lets the state store EVICT views older than the
  * watermark minus 2h and purchases older than the watermark — bounded
  * state, the 100 TB/day deployment shape. An INNER interval join's
  * output SET is delivery-order independent (every qualifying pair is
  * emitted exactly once, whenever its second leg arrives), which is what
  * makes a DuckDB batch replay a real oracle.
  *
  * Determinism contract (q98 pattern): each side stages to ONE parquet
  * file → one AvailableNow micro-batch per side; the sink is parquet with
  * an exactly-once commit log; the readback orders by (view_id,
  * purchase_id). A multi-batch deployment emits the same rows in arrival
  * order.
  */
object StreamJoin {

  /** q99 — views joined to purchases by the same user within (0, 2h],
    * streamed end-to-end. `gap_s` is the integer second gap (exact — both
    * engines difference microsecond epochs before dividing). */
  def q99StreamJoin(t: graft.Tables.T): DataFrame = {
    val views = t.events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id"))
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
    streamIntervalJoin(t.spark, views, purchases)
  }

  /** q106 — stream-STATIC enrichment join, the stateless complement of
    * q99: a live orders feed joins the static customer dimension as it
    * arrives. Spark plans the static side as a broadcast hash join
    * inside each micro-batch — no state store at all (nothing to evict:
    * the dimension is a table, not a feed), which is why this is THE
    * default enrichment shape at 100 TB/day: per-event dimension lookup
    * at map-side cost, re-broadcast per batch picking up dimension
    * updates between batches. No watermark is needed or set. Output is
    * batch-equal by construction (stateless inner join), so the oracle
    * is the plain join. */
  def q106StreamEnrich(t: graft.Tables.T): DataFrame = {
    val orders = t.events.filter(col("event_id") % 4 === 2)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val dim = t.customer
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    RoundTrip.run(t.spark, "graft_q106_", Seq(orders)) { case Seq(stream) =>
      // user ids are 1-based like custkeys; the slice's users all resolve
      stream
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_nationkey"),
          col("c_mktsegment"), round(col("value"), 2).as("value"))
    }.orderBy("event_id")
  }

  /** Reusable round-trip over pre-shaped (view_id, view_ts, user_id) ×
    * (purchase_id, purchase_ts, user_id, value) frames — public for the
    * spec's hand-built corpora. */
  def streamIntervalJoin(spark: SparkSession, views: DataFrame,
                         purchases: DataFrame): DataFrame =
    // An INNER join emits every pair inside the data batch it completes
    // in, so the trailing no-data micro-batch would only run state
    // EVICTION — all 8 state-store commits again, ~0.8 s here for zero
    // output. Skip it (RoundTrip scaladoc); a continuous deployment
    // evicts on subsequent data batches anyway.
    RoundTrip.run(spark, "graft_q99_", Seq(views, purchases),
      noDataBatches = false) { case Seq(v0, p0) =>
      val v = v0.withWatermark("view_ts", "0 seconds")
      val p = p0.withWatermark("purchase_ts", "0 seconds")
      v.join(p,
          v("user_id") === p("user_id") &&
            p("purchase_ts") > v("view_ts") &&
            p("purchase_ts") <= v("view_ts") + expr("INTERVAL 2 HOURS"))
        .select(v("user_id"), col("view_id"), col("view_ts"),
          col("purchase_id"), col("purchase_ts"),
          expr("(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000")
            .as("gap_s"),
          round(col("value"), 2).as("purchase_value"))
    }.orderBy("view_id", "purchase_id")
}
