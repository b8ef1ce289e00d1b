package graft.util

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Session-scoped memo cache for frames/indexes that die with their
  * SparkContext (persisted DataFrames, localCheckpoints, opened index
  * frames).
  *
  * Keyed by the session OBJECT (identity — SparkSession does not
  * override equals), with STOPPED-SESSION SWEEPING: every access first
  * drops entries whose owning context has stopped. This replaces two
  * earlier designs that both failed:
  *
  *  - round 2 keyed by `System.identityHashCode(spark)`, which could
  *    alias a new session onto a GC'd one's hash and hand back frames
  *    bound to a dead context;
  *  - a WeakHashMap on the session was a null fix: the cached
  *    DataFrames strongly reference their SparkSession, so value →
  *    key reachability meant no entry could ever be collected (the
  *    exact anti-pattern the WeakHashMap javadoc warns about).
  *
  * Sweeping is deterministic (no GC reliance): a stopped session's
  * entry is removed on the next cache access from anywhere, releasing
  * the frames and the session object. The frames' storage died with
  * the context already; this frees the driver-side references. */
final class SessionCache[V] {
  private val bySession =
    new java.util.IdentityHashMap[SparkSession, TrieMap[String, V]]()

  private def inner(s: SparkSession): TrieMap[String, V] =
    bySession.synchronized {
      bySession.keySet().asScala.filter(_.sparkContext.isStopped)
        .toList.foreach(bySession.remove)
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
