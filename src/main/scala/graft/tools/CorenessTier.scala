package graft.tools

import org.apache.spark.sql.SparkSession

import graft.RmatTier
import graft.graph.{Coreness, Graph}

/** Dev-only tier receipt for the coreness family (r10 judge item #5): the
  * G13b h-operator iteration has only been measured to sf0.1 (16k
  * vertices); the medium tier is 1M vertices / 16.8M symmetrized edges and
  * the large tier 14.7M / 265M — hub skew lands on the per-round window
  * sort there, and the large tier's |V| exceeds
  * [[RmatTier.BroadcastableVertices]] so the est-table flip to the
  * shuffle-join path is exercised for real.
  *
  * Prints rounds × wall per tier (the SURVEY §6 receipt shape).
  *
  * Usage: SPARK_DRIVER_MEM=64g tools/run_main.sh graft.tools.CorenessTier medium large
  */
object CorenessTier {
  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.toSeq else Seq("medium")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tiers.foreach { tier =>
      val (scale, na) = RmatTier.tiers(tier)
      val (edgesPath, _) =
        RmatTier.ensureData(spark, scale, na, "target/graft-data")
      val t0 = System.nanoTime()
      val g = Graph.fromRawEdges(spark.read.parquet(edgesPath))
      g.cachedUndirected.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val nv = g.vertices.count()
      val bc = nv <= RmatTier.BroadcastableVertices
      System.err.println(f"[coreness] tier=$tier nv=$nv bc=$bc " +
        f"build=$buildSec%.1f s")
      // rounds surface on stderr via GRAFT_CORENESS_PROF; the wall is the
      // receipt — maxIter generous, apply() throws if not converged
      val t1 = System.nanoTime()
      val res = Coreness(g, maxIter = 200, broadcastVertices = bc)
      val n = res.count()
      val sec = (System.nanoTime() - t1) / 1e9
      val maxCore = res.agg(org.apache.spark.sql.functions.max("coreness"))
        .head().getLong(0)
      System.err.println(f"[coreness] tier=$tier wall=$sec%.1f s " +
        f"rows=$n maxCore=$maxCore")
      g.preSymmetrized match {
        case Some(sym) => sym.unpersist(blocking = false)
        case None => g.cachedUndirected.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
