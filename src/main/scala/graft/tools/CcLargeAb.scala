package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{ConnectedComponents, Graph}

/** Dev-only A/B: connected-components algorithm choice on the large R-MAT
  * tier (SCALE 24), where the broadcast-state path OOMs and the reference
  * workload runs the shuffle-join fallback. Compares frontier-ized
  * min-label propagation (the default) against the dense classic
  * formulation (full state joined per round) and alternating large-star/
  * small-star, which needs no per-round |V| state join at all.
  * Generates the tier's edge parquet if absent (untimed).
  * Usage: runMain graft.tools.CcLargeAb [scale] [frontier|classic|star|all]
  */
object CcLargeAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(24)
    val mode = args.lift(1).getOrElse("frontier")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edgesPath = s"target/graft-data/rmat-s$scale-edges.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(edgesPath))) {
      val t0 = System.nanoTime()
      graft.graph.RMat.edges(spark, graft.graph.RMat.Params(scale))
        .write.parquet(edgesPath)
      System.err.println(f"[ab] edge gen (untimed): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val raw = spark.read.parquet(edgesPath)
    val g = Graph(raw.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight")))
    val t0 = System.nanoTime()
    g.cachedUndirected.count()
    System.err.println(f"[ab] build+cache ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val bc = g.vertices.count() <= graft.RmatTier.BroadcastableVertices

    def time(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val n = f
      System.err.println(f"[ab] $label%-28s ${(System.nanoTime() - t) / 1e9}%8.1f s ($n rows)")
    }
    if (mode == "frontier" || mode == "all")
      time(s"min-label frontier bc=$bc")(
        ConnectedComponents(g, broadcastVertices = bc).count())
    if (mode == "classic" || mode == "all")
      time(s"min-label classic bc=$bc")(
        ConnectedComponents.classic(g, broadcastVertices = bc).count())
    if (mode == "star" || mode == "all")
      time("alternating star")(ConnectedComponents.alternating(g).count())
    spark.stop()
  }
}
