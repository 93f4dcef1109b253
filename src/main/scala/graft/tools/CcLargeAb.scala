package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{ConnectedComponents, Graph}

/** Dev-only A/B: connected-components algorithm choice on the large R-MAT
  * tier (SCALE 24), where the broadcast-state path OOMs and the reference
  * workload runs the shuffle-join fallback. Compares S-V min-label
  * propagation (shuffle-join state) against alternating large-star/
  * small-star, which needs no per-round |V| state join at all.
  * Usage: runMain graft.tools.CcLargeAb [scale] [min|star|both]
  */
object CcLargeAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(24)
    val mode = args.lift(1).getOrElse("both")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"target/graft-data/rmat-s$scale-edges.parquet")
    val g = Graph(raw.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight")))
    val t0 = System.nanoTime()
    g.cachedUndirected.count()
    System.err.println(f"[ab] build+cache ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val n = f
      System.err.println(f"[ab] $label%-28s ${(System.nanoTime() - t) / 1e9}%8.1f s ($n rows)")
    }
    if (mode == "min" || mode == "both")
      time("min-label shuffle-join")(
        ConnectedComponents(g, broadcastVertices = false).count())
    if (mode == "star" || mode == "both")
      time("alternating star")(ConnectedComponents.alternating(g).count())
    spark.stop()
  }
}
