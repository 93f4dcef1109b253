package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{Graph, PageRank}

/** Dev-only A/B: frontier/delta PageRank threshold fraction vs the dense
  * power iteration, on a built R-MAT tier graph. Each variant runs
  * converged() to the same tol/maxIter; wall time and the resulting
  * max-|Δpr| vs dense are printed (the equivalence receipt at tier
  * scale, not just the spec's test graphs).
  *
  * Usage: runMain graft.tools.PrDeltaAb [scale] [thetaFrac...]
  */
object PrDeltaAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(20)
    val fracs = if (args.length > 1) args.drop(1).map(_.toDouble).toSeq
      else Seq(0.05, 0.5, 1.0, 2.0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(s"target/graft-data/rmat-s$scale-edges.parquet")
    val g = Graph(raw
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight")),
      edgesCanonical = true)
    val t0 = System.nanoTime()
    g.cachedUndirected.count()
    val bcast = g.vertices.count() <= graft.RmatTier.BroadcastableVertices
    System.err.println(f"[ab] build+cache ${(System.nanoTime() - t0) / 1e9}%.1f s bcast=$bcast")
    val td = System.nanoTime()
    val dense = PageRank.convergedDense(g, broadcastVertices = bcast)
      .localCheckpoint(true)
    dense.count()
    System.err.println(f"[ab] dense       ${(System.nanoTime() - td) / 1e9}%8.1f s")
    val tc = System.nanoTime()
    val cheby = PageRank.convergedCheby(g, broadcastVertices = bcast)
      .localCheckpoint(true)
    cheby.count()
    val cSec = (System.nanoTime() - tc) / 1e9
    val cDiff = dense.withColumnRenamed("pr", "pra")
      .join(cheby.withColumnRenamed("pr", "prb"), Seq("id"), "full_outer")
      .agg(max(abs(coalesce(col("pra"), lit(0.0)) -
        coalesce(col("prb"), lit(0.0))))).head().getDouble(0)
    System.err.println(f"[ab] cheby       $cSec%8.1f s  maxDiff=$cDiff%.2e")
    fracs.foreach { f =>
      System.setProperty("graft.pr.theta", f.toString) // doc only
      val t = System.nanoTime()
      val delta = graft.graph.PageRank.deltaWithTheta(g, f,
          broadcastVertices = bcast)
        .localCheckpoint(true)
      delta.count()
      val sec = (System.nanoTime() - t) / 1e9
      val diff = dense.withColumnRenamed("pr", "pra")
        .join(delta.withColumnRenamed("pr", "prb"), Seq("id"), "full_outer")
        .agg(max(abs(coalesce(col("pra"), lit(0.0)) -
          coalesce(col("prb"), lit(0.0))))).head().getDouble(0)
      System.err.println(f"[ab] delta f=$f%-5s $sec%8.1f s  maxDiff=$diff%.2e")
    }
    spark.stop()
  }
}
