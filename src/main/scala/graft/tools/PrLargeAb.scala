package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{Graph, PageRank}

/** Dev-only A/B: shuffle-partition count for large-tier PageRank. The
  * per-iteration contribution aggregate moves |E| rows through
  * `spark.sql.shuffle.partitions` reducers; at SCALE 24 that is 265M rows
  * — 8M per task at the default 32. Runs 10 fixed iterations at each
  * partition count on one built graph.
  * Usage: runMain graft.tools.PrLargeAb [scale] [parts...]
  */
object PrLargeAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(24)
    val parts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(32, 128)
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
    val raw = spark.read.parquet(edgesPath)
    val g = Graph(raw.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight")))
    val t0 = System.nanoTime()
    g.cachedUndirected.count()
    System.err.println(f"[ab] build+cache ${(System.nanoTime() - t0) / 1e9}%.1f s")
    parts.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val t = System.nanoTime()
      PageRank.fixedIterations(g, 10, broadcastVertices = false).count()
      System.err.println(f"[ab] pr-10 @ $p%4d shuffle parts ${(System.nanoTime() - t) / 1e9}%8.1f s")
    }
    spark.stop()
  }
}
