package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{Graph, PageRank}

/** Dev-only: pin graph_pagerank_conv's run-to-run variance. Replays the
  * bench's session policy — each trial on a fresh `newSession()` (warm
  * JVM, cold session memos) — several times in ONE JVM, reporting per-trial
  * wall time, GC-time delta, and cached-RDD count before/after. Combine
  * with GRAFT_PR_PROF=1 for per-iteration timing.
  * Usage: runMain graft.tools.PrVariance [trials] [dir]
  */
object PrVariance {
  def main(args: Array[String]): Unit = {
    val trials = args.headOption.map(_.toInt).getOrElse(3)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark0 = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    val gcBeans =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L
      gcBeans.forEach(b => t += b.getCollectionTime)
      t
    }
    (1 to trials).foreach { t =>
      val spark = spark0.newSession()
      val rdds0 = spark.sparkContext.getRDDStorageInfo.length
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val n = PageRank.converged(Graph.fromTpch(spark, dir)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rdds1 = spark.sparkContext.getRDDStorageInfo.length
      System.err.println(
        f"[prvar] trial $t: $sec%6.2f s  gc+${gcMs - gc0}%5d ms  " +
          f"cachedRdds $rdds0%3d -> $rdds1%3d  ($n rows)")
    }
    spark0.stop()
  }
}
