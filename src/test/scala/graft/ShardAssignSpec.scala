package graft

import graft.Tables.T
import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** q83 invariants (the oracle pins exact values; this pins the CONTRACT):
  * deterministic re-runs, full coverage, and token balance — contiguous
  * cum-range sharding means every shard's token sum is within one
  * document of the target budget. */
class ShardAssignSpec extends SparkSpec {
  private lazy val t = T(spark, "/root/testdata/sf0.001")

  test("every document gets exactly one shard; re-run is identical") {
    val a = Corpus.q83ShardAssign(t).collect().map(r => (r.getLong(0), r.getInt(2)))
    val b = Corpus.q83ShardAssign(t).collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(a.toSeq == b.toSeq)
    assert(a.length == t.documents.count())
    assert(a.map(_._1).distinct.length == a.length)
  }

  test("shards are token-balanced within one document of the target") {
    val out = Corpus.q83ShardAssign(t)
      .groupBy("shard_id").agg(sum("n_tokens").as("shard_tokens"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val totals = Corpus.q83ShardAssign(t)
      .agg(sum("n_tokens"), max("n_tokens")).head()
    val (total, maxDoc) = (totals.getLong(0), totals.getLong(1))
    val target = math.ceil(total.toDouble / Corpus.TrainShards).toLong
    // contiguous ranges: a shard exceeds target only by the one document
    // straddling its upper boundary
    out.foreach { case (sid, tokens) =>
      assert(tokens <= target + maxDoc, s"shard $sid: $tokens > $target + $maxDoc")
    }
    // no shard id outside range, and the leading shards are all present
    assert(out.keySet.forall(k => k >= 0 && k < Corpus.TrainShards))
    assert(out.keySet.max == out.keySet.size - 1)
  }
}
