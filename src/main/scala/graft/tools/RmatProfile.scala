package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{ConnectedComponents, Graph, PageRank}

/** Dev-only: A/B iterative-algorithm strategies on a pre-generated R-MAT
  * tier graph (run BenchSweep/RmatTier first so the parquet exists).
  * args: [scale] [workload: sv|svalt|pr] [mode: bc|shuffle]
  */
object RmatProfile {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(20)
    val workload = args.drop(1).headOption.getOrElse("sv")
    val mode = args.drop(2).headOption.getOrElse("bc")
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
    g.cachedUndirected.count()
    val bc = mode == "bc"
    val t0 = System.nanoTime()
    val n = workload match {
      case "sv" => ConnectedComponents(g, broadcastVertices = bc).count()
      case "svalt" => ConnectedComponents.alternating(g).count()
      case "pr" => PageRank.converged(g, broadcastVertices = bc).count()
    }
    System.err.println(f"[prof] s$scale $workload mode=$mode rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
