package graft.core

import org.apache.spark.sql.SparkSession

/** Hygiene for the session-scoped memo caches (graph instances, converged
  * labels, verified pair sets): entries are keyed by SparkSession (directly
  * or via a DataFrame) and would otherwise outlive it — a stopped session's
  * checkpointed RDDs can never be reclaimed while a strong reference
  * remains. Every cache sweeps dead-session entries on access, so a
  * long-lived JVM cycling sessions (notebook servers, test suites) holds
  * live state for live sessions only.
  */
object SessionCaches {
  /** Remove every entry whose owning session has been stopped. */
  def sweep[K, V](cache: scala.collection.concurrent.TrieMap[K, V])(
      session: K => SparkSession): Unit =
    cache.keys.foreach { k =>
      if (session(k).sparkContext.isStopped) cache.remove(k)
    }
}
