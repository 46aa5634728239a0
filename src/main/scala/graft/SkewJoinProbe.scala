package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-side hot-key JOIN rehearsal (scratch tooling — r16 verdict item
  * 4): every measured zipf cell so far was insulated by partial
  * aggregation, so the two mechanisms claimed for pathological JOIN
  * skew — AQE's skew-split and the declared q103 salting operator —
  * had never fired in a measurement. This probe makes the raw side
  * meet a dim on the zipf key with NO pre-aggregation: events
  * (user_id redrawn zipf, one key owning ~13% of 3M rows at the 30×
  * pair) joins the customer dim on the key WITH the wide props
  * payload in flight, then aggregates per nation — so all legs
  * compare value-identical while the join itself carries raw rows.
  *
  * Broadcast is DISABLED in the probe legs: with a broadcast-able dim
  * there is no join skew to rehearse (broadcast IS the first
  * mitigation — noted in the cells); the probe rehearses the 100 TB
  * case where both sides shuffle. The AQE skew thresholds are scaled
  * to the corpus (skewedPartitionThresholdInBytes default 256 MB is a
  * 1000-executor setting; the hot partition here is ~10 MB) — the
  * KNOB is the finding, the split is the evidence.
  *
  * Legs per corpus: plain sort-merge with AQE skew-join OFF (the
  * victim), ON (the split — numSkewedPartitions/numSplits read from
  * the AQEShuffleRead metrics), and the q103 salted form. Value
  * identity asserted across legs on the zipf corpus (n_orders exact;
  * total_price to the cent — double sums re-associate across plans).
  *
  *   sbt "runMain graft.ScaleGen 30 /tmp/graft_sf3"
  *   sbt "runMain graft.ScaleGen 30 /tmp/graft_sf3z zipf"
  *   sbt "runMain graft.SkewJoinProbe"
  */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/tmp/graft_sf3"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // corpus-scaled skew thresholds (defaults are cluster-sized:
      // 256 MB / 5x median — the hot partition here is ~10 MB)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // no broadcast: rehearse the both-sides-shuffle regime
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the raw fact side rides WIDE (event props in flight — the
    // realistic enrich-join shape where the payload crosses the wire
    // with the row): the zipf user's partition is tens of MB, the
    // regime the 256 MB production threshold is scaled down to meet
    def rawEvents(dir: String): DataFrame =
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_id"), col("value"), col("props"))
    def dim(dir: String): DataFrame =
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    def aggregate(joined: DataFrame): DataFrame = joined
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        sum(length(col("props"))).as("props_bytes"))
      .orderBy("c_nationkey")
    def plainJoin(dir: String): DataFrame =
      aggregate(rawEvents(dir).join(dim(dir), Seq("user_id")))
    def saltedForm(dir: String): DataFrame =
      aggregate(operators.ScaleTechniques.saltedJoin(
        rawEvents(dir), dim(dir), "user_id", "event_id", 8))

    def time(mk: () => DataFrame): (Double, DataFrame) = {
      def noop(df: DataFrame): Unit =
        df.write.mode("overwrite").format("noop").save()
      noop(mk()) // warm
      var last: DataFrame = null
      val best = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val df = mk(); noop(df); last = df
        (System.nanoTime() - t0) / 1e9
      }.min
      (best, last)
    }
    def skewMetrics(df: DataFrame): String = {
      // AQEShuffleRead carries numSkewedPartitions / numSkewedSplits
      // after execution; walk THROUGH query-stage boundaries (their
      // children list is empty — plain collect stops at them)
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
      import org.apache.spark.sql.execution.SparkPlan
      def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
        case q: QueryStageExec => deep(q.plan)
        case _ => p.children.flatMap(deep)
      })
      val nodes = deep(df.queryExecution.executedPlan)
      val reads = nodes.collect { case r: AQEShuffleReadExec => r }
      val sk = reads.flatMap(_.metrics.get("numSkewedPartitions").map(_.value)).sum
      val sp = reads.flatMap(_.metrics.get("numSkewedSplits").map(_.value)).sum
      val joins = nodes.filter(_.nodeName.toLowerCase.contains("join"))
        .map(_.nodeName).distinct.mkString("+")
      s"skewedPartitions=$sk skewedSplits=$sp join=$joins"
    }

    val legs: Seq[(String, Boolean, String => DataFrame)] = Seq(
      ("plain/skewjoin-off", false, plainJoin _),
      ("plain/skewjoin-on", true, plainJoin _),
      ("salted/skewjoin-off", false, saltedForm _))
    val results =
      collection.mutable.Map.empty[(String, String), Array[org.apache.spark.sql.Row]]
    for ((tag, dir) <- Seq("uniform" -> root, "zipf" -> s"${root}z");
         (leg, skewOn, mk) <- legs) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val (best, df) = time(() => mk(dir))
      // execute THIS frame's own QueryExecution so the AQE metrics
      // read from its finalized plan, not a lazy copy — and KEEP the
      // rows: the value-identity compare below reuses them instead of
      // re-running the whole join a seventh time per leg
      results((tag, leg)) = df.collect()
      println(f"[skewjoin] $tag%-8s $leg%-20s ${best}%.2fs ${skewMetrics(df)}")
    }
    // value identity across legs on the zipf corpus: counts exact,
    // price to the cent (double sums re-associate across plans)
    def asMap(rows: Array[org.apache.spark.sql.Row]): Map[String, (Long, Double, Long)] =
      rows.map(r => r.get(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val base = asMap(results(("zipf", "plain/skewjoin-off")))
    for (leg <- Seq("plain/skewjoin-on", "salted/skewjoin-off")) {
      val other = asMap(results(("zipf", leg)))
      require(other.keySet == base.keySet, s"$leg nation set diverged")
      base.foreach { case (k, (n, p, pb)) =>
        val (n2, p2, pb2) = other(k)
        require(n2 == n && pb2 == pb, s"$leg nation $k: $n2/$pb2 vs $n/$pb")
        require(math.abs(p2 - p) <= 0.011, s"$leg nation $k: $p2 vs $p")
      }
      println(s"[skewjoin] $leg value-identical to plain on zipf: ok")
    }
    spark.stop()
  }
}
