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
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      val broadcasts = "BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(plan).length
      val cartesian = "CartesianProduct".r.findAllIn(plan).length
      val codegen = "WholeStageCodegen".r.findAllIn(plan).length
      val scans = plan.split("\n").filter(_.contains("ReadSchema")).map(_.trim.take(160))
      println(s"== $name: broadcasts=$broadcasts cartesian=$cartesian codegenSpans=$codegen")
      scans.foreach(s => println("   " + s))
    }
    spark.stop()
  }
}
