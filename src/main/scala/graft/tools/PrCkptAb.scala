package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{Graph, PageRank}

/** Dev-only A/B: double-buffered state for converged (Chebyshev)
  * PageRank — eager-checkpoint every Nth round, lazy intermediates
  * materializing inside the next eager round's job. Trades per-round
  * driver barriers for N-deep lineage; this measures whether the barrier
  * is worth anything next to the per-iteration shuffle physics.
  * Usage: runMain graft.tools.PrCkptAb [scale] [every...]
  */
object PrCkptAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(22)
    val everys = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 2, 3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edgesPath = s"target/graft-data/rmat-s$scale-edges.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(edgesPath))) {
      val tg = System.nanoTime()
      graft.graph.RMat.edges(spark, graft.graph.RMat.Params(scale))
        .write.parquet(edgesPath)
      System.err.println(f"[ab] edge gen (untimed): ${(System.nanoTime() - tg) / 1e9}%.1f s")
    }
    val g = Graph.fromRawEdges(spark.read.parquet(edgesPath))
    val t0 = System.nanoTime()
    val ne = g.cachedUndirected.count()
    System.err.println(f"[ab] build+cache ${(System.nanoTime() - t0) / 1e9}%.1f s ne=$ne")
    val bc = g.vertices.count() <= graft.RmatTier.BroadcastableVertices
    // interleave to separate the knob from session drift
    for (round <- 1 to 2; e <- everys) {
      val t = System.nanoTime()
      PageRank.convergedCheby(g, broadcastVertices = bc, ckptEvery = e).count()
      System.err.println(f"[ab] round $round cheby ckptEvery=$e ${(System.nanoTime() - t) / 1e9}%8.1f s")
    }
    spark.stop()
  }
}
