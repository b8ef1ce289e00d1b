package graft.util

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-scoped memo cache for frames/indexes that die with their
  * SparkContext (persisted DataFrames, localCheckpoints, opened index
  * frames).
  *
  * Keyed by the session OBJECT through a [[java.util.WeakHashMap]]
  * (SparkSession does not override equals, so WeakHashMap's
  * equals-based lookup IS identity here): once a session is
  * unreachable its whole entry — and every cached frame pinned through
  * it — becomes collectable. This replaces the round-2
  * `System.identityHashCode(spark)` keying, which (a) pinned stopped
  * sessions for the JVM lifetime and (b) could alias a new session
  * onto a GC'd one's hash and hand back frames bound to a dead
  * context.
  *
  * Entries are not unpersisted on eviction — eviction only happens
  * when the owning context is already unreachable, at which point the
  * blocks are gone with it.
  */
final class SessionCache[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, TrieMap[String, V]]()

  private def inner(s: SparkSession): TrieMap[String, V] =
    bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) { m = TrieMap.empty[String, V]; bySession.put(s, m) }
      m
    }

  /** Memoize `mk` per (session, key). Like TrieMap.getOrElseUpdate,
    * concurrent first calls may race `mk`; callers cache idempotent
    * builds so a duplicate build is waste, not corruption. */
  def getOrElseUpdate(s: SparkSession, key: String)(mk: => V): V =
    inner(s).getOrElseUpdate(key, mk)
}
