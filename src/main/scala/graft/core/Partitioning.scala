package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Size-driven partitioning for persisted iteration inputs.
  *
  * Iterative algorithms scan their cached edge table once per round. With
  * the default shuffle-partition count a small table becomes dozens of
  * near-empty tasks and per-round wall time is pure scheduler overhead; an
  * under-partitioned huge table spills. Catalyst's pre-execution size
  * estimate is useless here (join cardinality estimates can be off by 10^5×
  * — observed 2.19 TB estimated for a 24 MB join result), so partition on
  * the ACTUAL row count: persist, count, and re-partition the cached rows
  * only when the existing layout is badly off (>4× either way).
  */
object Partitioning {
  def cachedSized(df: DataFrame, rowsPerPartition: Long = 1000000L,
      maxPartitions: Int = 1 << 17,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    val n = cached.count()
    val current = cached.rdd.getNumPartitions
    val target = ((n + rowsPerPartition - 1) / rowsPerPartition)
      .max(1L).min(maxPartitions.toLong).toInt
    if (current >= target * 4 || current.toLong * 4 <= target) {
      val rep = cached.repartition(target).persist(level)
      rep.count()
      cached.unpersist()
      rep
    } else cached
  }

  /** Size-driven AND key-aligned caching: hash-partition the persisted rows
    * on `keys`. An InMemoryTableScan preserves its child's HashPartitioning,
    * so every later join/aggregate clustered on the same keys reads the
    * cache WITHOUT re-exchanging it — the other (usually |V|-sized) side
    * shuffles to match instead. For a 265M-edge table iterated 100 times
    * (PageRank's edges ⋈ state on the shuffle fallback path) that converts
    * one edge-sized exchange per iteration into a state-sized one.
    *
    * Unlike [[cachedSized]] this always re-partitions: the input's layout
    * is whatever the build join produced, never hash-on-key. Hub skew
    * (power-law src) is bounded by rowsPerPartition sizing; a hub's edges
    * land in one partition alongside its ~1/N uniform share.
    */
  def cachedSizedBy(df: DataFrame, keys: Seq[String],
      rowsPerPartition: Long = 1000000L,
      maxPartitions: Int = 1 << 17,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    val n = cached.count()
    val target = ((n + rowsPerPartition - 1) / rowsPerPartition)
      .max(1L).min(maxPartitions.toLong).toInt
    val rep = cached.repartition(target, keys.map(col): _*).persist(level)
    rep.count()
    cached.unpersist()
    rep
  }
}
