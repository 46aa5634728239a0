package graft

import graft.Tables.T
import graft.operators.{Polls, TextAnalysis}

/** Session-keyed cache lifecycle (r10 advice): `Tables.planCache`,
  * `Polls.stagingCache` and `TextAnalysis.claimCorpusCache` memoize plans
  * (and their localCheckpoint blocks) per (SparkSession, sfDir). A stopped
  * session must not stay pinned through those keys — SessionCaches installs
  * a listener whose ApplicationEnd event (drained synchronously inside
  * `SparkContext.stop()`) drops every entry keyed by the stopped session.
  *
  * This spec deliberately stops the shared test session; SparkSpec.session
  * transparently rebuilds on next access, and suites run sequentially in
  * the forked test JVM, so no other suite observes the stop.
  */
class SessionCacheSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("stopping a session evicts every session-keyed cache entry") {
    val s = spark
    val t = T(s, sf)
    // Populate all three caches through their public entrypoints.
    assert(t.orders.count() > 0)                       // Tables.planCache
    assert(Polls.stgPollResultsTable(t).count() > 0)   // Polls.stagingCache
    assert(TextAnalysis.q32ClaimsGerman(t).count() > 0) // claimCorpusCache
    assert(SessionCaches.anyEntryFor(s),
      "caches should hold entries for the live session")

    s.stop()
    assert(!SessionCaches.anyEntryFor(s),
      "stop() must evict all cache entries keyed by the stopped session")

    // The shared harness recovers: a fresh session repopulates cleanly.
    val s2 = SparkSpec.session
    assert(s2 ne s)
    assert(T(s2, sf).orders.count() > 0)
    assert(SessionCaches.anyEntryFor(s2))
    assert(!SessionCaches.anyEntryFor(s))
  }
}
