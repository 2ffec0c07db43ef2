package graft.util

/** Bounded keyed cache for the train-once/reuse pattern (Curation's
  * per-source-dir sketch frames and ANN indexes): the expensive pass runs
  * once per key and later queries share the artifact. LRU-bounded with
  * release-on-evict (e.g. unpersisting the evicted DataFrame): a one-shot
  * gate run touches one dir and never evicts, while a long-lived server
  * touching many source dirs stays at ≤ `maxEntries` live artifacts
  * instead of accumulating persisted frames for the JVM's life. A key
  * re-touched after eviction simply rebuilds — correctness never depends
  * on the cache. */
final class DirCache[V](maxEntries: Int, release: V => Unit) {
  // a 0-entry cache evicts on every put — every getOrElseUpdate
  // rebuilds, which is a silent train-twice bug, not a cache (r18:
  // an object-initialization-order accident constructed exactly that)
  require(maxEntries >= 1,
    s"DirCache needs maxEntries >= 1, got $maxEntries (a constant " +
      "declared after the cache that references it reads as 0)")
  private val entries = new java.util.LinkedHashMap[String, V](
      16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      if (size() > maxEntries) { release(e.getValue); true } else false
  }

  /** Builds (and caches) under the lock: sequential gate/server callers
    * never race, and a duplicate concurrent build would double-persist. */
  def getOrElseUpdate(key: String, build: => V): V = synchronized {
    val cached = entries.get(key)
    if (cached != null) cached
    else { val v = build; entries.put(key, v); v }
  }

  def size: Int = synchronized(entries.size())
}
