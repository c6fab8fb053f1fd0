package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** getOrElseUpdate wrapper for SESSION-keyed index/layout caches (ADVICE
  * r15). These caches key by SparkSession reference on purpose: the
  * cached frames are localCheckpoints whose blocks live in the creating
  * session's block manager, so a second session in the same JVM must
  * rebuild rather than read a dead session's blocks (the pqEncCache
  * scaladoc documents the lifetime). But a plain TrieMap then pins the
  * DataFrame shells — and through them the lineage and session — for the
  * JVM lifetime after the session stops: harmless in the bench/test
  * drivers (one session per JVM), a slow leak for a long-lived
  * multi-session embedder. Each access therefore first drops entries
  * whose session's SparkContext has stopped (their checkpoint blocks
  * already died with the block manager; the shells were unusable
  * anyway). Purge cost is O(entries) reference checks over a handful of
  * keys per access — noise next to the build the cache exists to avoid.
  */
private[graft] object SessionCache {

  /** Evict every entry whose key the predicate marks dead. Factored out
    * of [[cached]] so the purge mechanism is testable without stopping a
    * real SparkContext (local-mode sessions share one context; stopping
    * it would kill the test fixture).
    */
  private[graft] def purge[K, V](cache: TrieMap[K, V])(
      dead: K => Boolean): Unit =
    cache.keysIterator.foreach { k => if (dead(k)) cache.remove(k) }

  // session extractor in its OWN parameter list: K is fixed by the first
  // list, so the `_._1` shorthand at the 14 call sites infers.
  def cached[K, V](cache: TrieMap[K, V], key: K)(session: K => SparkSession)(
      build: => V): V = {
    purge(cache)(k => session(k).sparkContext.isStopped)
    cache.getOrElseUpdate(key, build)
  }
}
