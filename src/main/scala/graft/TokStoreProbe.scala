package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q182/q183 tokenizer-store cost probe (scratch tooling, not library
  * surface): shows the ENCODE leg's cost tracks the BATCH against a
  * stored model, while the TRAIN leg grows with the corpus vocabulary —
  * the seam that makes the store discipline worth running instead of
  * q181's retrain-inside-the-encode (the r17 verdict's one cost-shape
  * watch item).
  *
  * Per corpus scale (sf0.01, sf0.1, optional 30×):
  *   - train   = bpeStore on the base split (the store build: corpus
  *               collapse + 8 keyed vocab-sized rounds), dictionary
  *               materialized — the once-per-model cost
  *   - encode  = bpeEncodeAgainstStore of today's batch (doc_id%10=0)
  *               against the ALREADY-BUILT store — the per-batch cost
  *   - retrain = q181's shape (train + encode fused, the declared
  *               redundancy this store removes)
  * encode must stay a small fraction of retrain and scale with the
  * batch; train carries the vocabulary growth (type-bound — SCALE.md's
  * lex section measures the exponent).
  *
  *   sbt "runMain graft.TokStoreProbe"               # sf0.01 + sf0.1
  *   sbt "runMain graft.TokStoreProbe /tmp/graft_sf3" # + the 30× corpus
  */
object TokStoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.windowExecWarnings()
    import graft.operators.{Corpus, Lexicon}

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val dirs = Seq("sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1") ++
      args.headOption.map(d => "30x" -> d)
    for ((name, dir) <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val base = Lexicon.multiLexBase(docs)
      val batch = Lexicon.multiLexDelta(docs).localCheckpoint()
      val nBatch = batch.count()
      // warm pass, then min-of-2 per leg; the store build materializes
      // the dictionary (count) like a deployment's artifact write
      def trainLeg() = {
        val (m, d) = Corpus.bpeStore(base, 8); d.count(); (m, d)
      }
      trainLeg()
      val trainRuns = (1 to 2).map(_ => time(trainLeg()))
      val (merges, dict) = trainRuns.last._1
      val trainS = trainRuns.map(_._2).min
      def encodeLeg() =
        Corpus.bpeEncodeAgainstStore(merges, dict, batch).collect()
      encodeLeg()
      val encodeS = (1 to 2).map(_ => time(encodeLeg())._2).min
      def retrainLeg() = Corpus.bpeEncodeFromStore(base, batch, 8).collect()
      retrainLeg()
      val retrainS = (1 to 2).map(_ => time(retrainLeg())._2).min
      // q188's stateless per-occurrence meter on the same batch — the
      // vocab-collapse-vs-chain trade: the batch leg amortizes repeated
      // words through the dictionary broadcast, the meter pays the
      // replace chain per occurrence but carries zero state and zero
      // shuffles (the streaming-serving shape)
      def meterLeg() = Corpus.bpeTokenMeter(merges, batch).collect()
      meterLeg()
      val meterS = (1 to 2).map(_ => time(meterLeg())._2).min
      println(f"[tokstore] $name train=$trainS%.2fs encode=$encodeS%.2fs " +
        f"retrain+encode=$retrainS%.2fs meter=$meterS%.2fs " +
        f"(batch=$nBatch%d docs)")
    }
    spark.stop()
  }
}
