package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{Graph, GraphColoring}

/** Dev-only A/B: graph-coloring round state eager (pre-r10: 4 eager
  * localCheckpoints + 1 count = 5 jobs/round) vs lazy (r10: sel/u/undU
  * lazy, materialized together by the round's one remaining-count job =
  * 2 jobs/round; tent stays eager for its two broadcast consumers).
  * The suite's #1 query showed a 2x cross-host spread in r9 —
  * barrier-count sensitivity — so this measures the job-count cut on the
  * same TPC-H graph the suite runs.
  * Usage: runMain graft.tools.ColoringAb [sfDir] [reps]
  */
object ColoringAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = Graph.fromTpch(spark, sfDir)
    val t0 = System.nanoTime()
    val ne = g.cachedUndirected.count()
    System.err.println(f"[ab] build+cache ${(System.nanoTime() - t0) / 1e9}%.1f s ne=$ne")
    // interleave to separate the knob from session drift; lazy first so
    // the eager leg gets any JIT benefit (bias against the new shape)
    for (round <- 1 to reps; lazyState <- Seq(true, false)) {
      val t = System.nanoTime()
      val n = GraphColoring(g, lazyRoundState = lazyState).count()
      System.err.println(f"[ab] round $round lazyRoundState=$lazyState%-5s " +
        f"${(System.nanoTime() - t) / 1e9}%6.2f s ($n vertices)")
    }
    spark.stop()
  }
}
