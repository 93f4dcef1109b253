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
  /** Monotonic count of session-memo HITS (converged analytics, memoized
    * graph instances, verified pair sets). Bench samples it around each
    * query and flags rows whose runtime rode state computed by an EARLIER
    * query — without the flag, a drain-time memo hit (e.g.
    * `stream_sssp_incremental` reusing the converged distances
    * `graph_update_sssp` already computed) makes cross-round timing
    * comparisons session-order-dependent with no way to tell from the
    * artifact.
    */
  val memoHits = new java.util.concurrent.atomic.AtomicLong(0L)

  /** [[scala.collection.concurrent.TrieMap.getOrElseUpdate]] that counts a
    * [[memoHits]] hit when the key was already present.
    */
  def countingGet[K, V](cache: scala.collection.concurrent.TrieMap[K, V],
      key: K)(build: => V): V =
    cache.get(key) match {
      case Some(v) => memoHits.incrementAndGet(); v
      case None => cache.getOrElseUpdate(key, build)
    }
  /** Remove every entry whose owning session has been stopped. */
  def sweep[K, V](cache: scala.collection.concurrent.TrieMap[K, V])(
      session: K => SparkSession): Unit =
    cache.keys.foreach { k =>
      if (session(k).sparkContext.isStopped) cache.remove(k)
    }

  /** Order-insensitive fingerprint of the file listing under `dir`
    * (relative path + size + mtime per regular file, local filesystem).
    * Used as a defensive staleness check by the dir-keyed memo caches: a
    * rewrite of the parquet under a cached directory changes the
    * fingerprint, so the cache rebuilds instead of serving a snapshot of
    * data that no longer exists. Missing dirs hash to 0 (the read itself
    * will fail with the real error).
    */
  def dirFingerprint(dir: String): Long = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dir)
    if (!Files.exists(root)) 0L
    else {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .map { p =>
            var h = root.relativize(p).toString.hashCode.toLong * 1315423911L
            h = (h + Files.size(p)) * 1315423911L
            h + Files.getLastModifiedTime(p).toMillis
          }
          .foldLeft(17L)(_ ^ _) // XOR: listing order never matters
      } finally walk.close()
    }
  }

  /** `getOrElseUpdate` for caches keyed by (key, input-dir): the stored key
    * carries [[dirFingerprint]] of `dir` at build time, and an entry whose
    * fingerprint no longer matches is dropped and rebuilt. Turns the
    * "first call snapshots the dir" comment contract of the memo caches
    * into a checked one.
    */
  def freshOrUpdate[K, V](
      cache: scala.collection.concurrent.TrieMap[(K, Long), V],
      key: K, dir: String)(build: => V): V = {
    val fp = dirFingerprint(dir)
    cache.keys.foreach { case (k, f) =>
      if (k == key && f != fp) cache.remove((k, f))
    }
    countingGet(cache, (key, fp))(build)
  }
}
