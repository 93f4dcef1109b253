package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.Graph

/** Dev-only A/B: the tier build pipeline, old vs new shape at one SCALE.
  *
  *   old — canonical groupBy (1st exchange) → symmetrize union →
  *         cachedSizedBy: persist+count, repartition(src) (2nd exchange),
  *         persist+count again — two full materializations of the
  *         symmetrized view;
  *   new — [[Graph.fromRawEdges]]: explode both orientations, ONE
  *         exchange hashed on src (which already satisfies the (src,dst)
  *         dedup clustering), aggregate in place, persist+count once.
  *
  * Usage: runMain graft.tools.BuildLargeAb [scale] [trials]
  */
object BuildLargeAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(24)
    val trials = if (args.length > 1) args(1).toInt else 2
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
    for (t <- 1 to trials) {
      val raw = spark.read.parquet(edgesPath)
      val t0 = System.nanoTime()
      val gOld = Graph(raw
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("weight")),
        edgesCanonical = true)
      val neOld = gOld.cachedUndirected.count()
      System.err.println(f"[ab] trial $t old build ${(System.nanoTime() - t0) / 1e9}%7.1f s  ne=$neOld")
      gOld.cachedUndirected.unpersist(blocking = true)
      val t1 = System.nanoTime()
      val gNew = Graph.fromRawEdges(raw)
      val neNew = gNew.cachedUndirected.count()
      System.err.println(f"[ab] trial $t new build ${(System.nanoTime() - t1) / 1e9}%7.1f s  ne=$neNew")
      assert(neOld == neNew, s"edge counts diverged: $neOld vs $neNew")
      gNew.preSymmetrized.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
