package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Harness-scale floor tuning shared by Bench and Verify.
  *
  * Everything here is a LATENCY knob for the local[32] / sub-MB-shuffle
  * harness — none of it changes results, and a 100 TB cluster deployment
  * would keep the Spark defaults (documented per knob):
  *
  *  - AQE small-shuffle coalescing (`parallelismFirst=false`, 1 MB
  *    advisory): a 500-row aggregate does not need 32 ~empty reduce
  *    tasks. Clusters keep the 64 MB default advisory size.
  *  - shuffle (+spill) compression off: every suite shuffle is sub-MB on
  *    a local disk; LZ4 latency buys nothing. Clusters keep compression —
  *    network and spill volume dominate there.
  *  - `maxPartitionBytes=8m`: single-file local tables split into a few
  *    scan tasks, restoring the parallelism a multi-file production root
  *    gets for free.
  *  - `preferSortMergeJoin=false`: shuffled-hash over sort-merge when a
  *    side fits per-partition memory; AQE's runtime sizes keep it safe.
  *  - `bypassMergeThreshold=8` (r12, FloorGrid-measured): at 32 shuffle
  *    partitions the bypass-merge writer opens 32 temp files per map
  *    task (32 mappers → 1024 file creates per exchange); forcing the
  *    serialized (Tungsten) writer makes each map task write one spill
  *    file. Above 200 partitions — i.e. any cluster job — Spark already
  *    picks the serialized writer, so this only changes the local floor.
  *  - `spark.local.dir=/dev/shm` when present (r12): shuffle scratch on
  *    tmpfs. Suite shuffles are sub-MB, so file-create + fsync latency
  *    dominates, not bandwidth or capacity; Spark removes its blockmgr
  *    and spark-uuid scratch dirs on session stop. Clusters keep fast local
  *    disks — 100 TB shuffle spill does not fit in RAM.
  *
  * Measured effect (FloorGrid, 9-query sample, median-of-3): shipped r11
  * config 3.38 s → 1.85 s with the two r12 knobs; the minimal 2-stage
  * shuffle job fell 0.33 s → 0.19 s.
  */
object HarnessTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val tuned = b
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
    if (Files.isDirectory(Paths.get("/dev/shm"))) tuned.config("spark.local.dir", "/dev/shm")
    else tuned
  }
}
