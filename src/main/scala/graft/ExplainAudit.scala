package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val defaults = Seq("q03_top_customers", "q21_poll_unpivot",
      "q25_ann_cosine_topk", "q27_minhash_neardup", "q48_topic_scoring")
    for (name <- if (args.nonEmpty) args.toSeq else defaults) {
      // EXECUTE before reading the plan: under AQE the pre-execution
      // string is the unfinalised adaptive skeleton — codegen spans,
      // chosen join strategies and reused exchanges only appear in the
      // final plan (an earlier version audited the skeleton and read
      // codegenSpans=0 for everything)
      val df = SparkEntry.queries(name)(spark, sf)
      // drive THIS frame's QueryExecution (df.write would plan a fresh
      // one and leave the audited plan untouched); toRdd.foreach runs
      // it fully distributed with nothing collected
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      val broadcasts = "BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(plan).length
      val cartesian = "CartesianProduct".r.findAllIn(plan).length
      // toString marks codegen stages with "*(id)" prefixes, not a
      // WholeStageCodegen node name — count DISTINCT stage ids
      val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      // count Exchange NODES (hash + range): a ReusedExchange line
      // embeds the referenced exchange's description, so a plain
      // substring count double-counts every reuse
      val shuffles = plan.split("\n").count(l =>
        !l.contains("ReusedExchange") &&
          ("Exchange hashpartitioning".r.findFirstIn(l).isDefined ||
            "Exchange rangepartitioning".r.findFirstIn(l).isDefined))
      val scans = plan.split("\n").filter(_.contains("ReadSchema")).map(_.trim.take(160))
      println(s"== $name: broadcasts=$broadcasts cartesian=$cartesian " +
        s"codegenSpans=$codegen shuffles=$shuffles")
      scans.foreach(s => println("   " + s))
    }
    spark.stop()
  }
}
