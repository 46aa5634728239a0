package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifecycle plumbing for the session-keyed plan caches
  * (`Tables.planCache`, `Polls.stagingCache`, `TextAnalysis
  * .claimCorpusCache`) and the JVM-scoped scratch dirs.
  *
  * The caches memoize immutable logical plans (and their eager
  * localCheckpoint blocks) per (SparkSession, sfDir). Without eviction a
  * stopped session stays reachable through the map key, pinning the
  * session object and its checkpointed blocks for the life of the JVM —
  * harmless in the one-session-per-JVM bench/verify entrypoints, wrong
  * for any long-lived host (r10 advice). Each cache registers an eviction
  * callback here; the first `arm(spark)` installs ONE listener on that
  * session's context, and `SparkListenerApplicationEnd` (posted and
  * drained synchronously inside `SparkContext.stop()`) fires every
  * callback with the stopped session.
  */
object SessionCaches {
  private val evictors =
    new java.util.concurrent.ConcurrentLinkedQueue[SparkSession => Unit]()
  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register a cache's eviction callback. Called once per cache object
    * (static init); the callback must drop every entry keyed by the given
    * session and nothing else. */
  def onStop(evict: SparkSession => Unit): Unit = evictors.add(evict)

  /** Ensure `spark`'s stop fires the registered evictors. Idempotent and
    * cheap (one set lookup) — call it from every cache-miss path. */
  def arm(spark: SparkSession): Unit =
    if (armed.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evictors.forEach(f => f(spark))
          armed.remove(spark)
        }
      })
    }

  /** True iff any registered cache still holds an entry for `spark` —
    * test hook for the eviction spec. */
  private[graft] val holders =
    new java.util.concurrent.ConcurrentLinkedQueue[SparkSession => Boolean]()
  private[graft] def registerHolder(f: SparkSession => Boolean): Unit = holders.add(f)
  private[graft] def anyEntryFor(spark: SparkSession): Boolean = {
    val it = holders.iterator()
    var found = false
    while (it.hasNext && !found) found = it.next()(spark)
    found
  }
}

/** JVM-scoped scratch directories for materialized intermediates (q81's
  * minhash-pair table, q82's compacted-table rewrite). One directory per
  * prefix per JVM — repeated invocations reuse it via `mode("overwrite")`
  * instead of minting a fresh temp dir each call (r10: a bench run leaked
  * ~7 full table copies per round) — and a shutdown hook removes the whole
  * tree when the JVM exits.
  */
object TmpDirs {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def scoped(prefix: String): String =
    dirs.computeIfAbsent(prefix, { _ =>
      // Scratch on tmpfs when the host has it (r12, same call as
      // HarnessTuning's spark.local.dir): everything under TmpDirs is
      // MB-scale staging / checkpoint / round-trip state whose cost is
      // file-create + fsync latency — streaming checkpoint commits fsync
      // once per micro-batch — not capacity. Falls back to the JVM temp
      // dir elsewhere; a cluster deployment stages to real storage.
      val shm = java.nio.file.Paths.get("/dev/shm")
      val d = (if (java.nio.file.Files.isDirectory(shm))
        java.nio.file.Files.createTempDirectory(shm, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)).toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(d)))
      d.toString
    })

  /** Subdirectory of the scoped root, keyed INJECTIVELY by `key` (URL
    * encoding — no hashCode collisions): two different sf dirs never
    * share an output path, so a cached reference to one can't be
    * overwritten by a later write for the other. */
  def keyed(prefix: String, key: String): String =
    scoped(prefix) + "/" + java.net.URLEncoder.encode(key, "UTF-8")

  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Monotone per-JVM run id for invocation-scoped scratch naming —
    * shared by every fresh-dir site so the device lives in ONE place. */
  def nextRunId(): Long = runSeq.incrementAndGet()

  /** Invocation-scoped scratch dir: [[keyed]] plus a run id no other
    * invocation ever reuses, so a later run's overwrite can never race a
    * previously returned frame's readback (r12 advice). Still under the
    * shutdown-swept scoped root. */
  def fresh(prefix: String, key: String): String =
    keyed(prefix, s"$key#r${nextRunId()}")

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }
}
