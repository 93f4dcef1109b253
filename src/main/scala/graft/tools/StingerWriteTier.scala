package graft.tools

import org.apache.spark.sql.SparkSession

import graft.RmatTier
import graft.graph.Graph
import graft.sources.StingerFiles

/** Dev-only tier receipt for the distributed STINGER-binary writer (r11
  * verdict item #7): the reference's rmatter emits 265M-edge `.g` files
  * (rmatter/src/rmatter.c:385 region); graft's writer must produce
  * reference-format CSR at tier scale too, not just fixtures. Writes the
  * tier's symmetrized adjacency to `.g`, reads it back distributed, and
  * asserts exact row equality — the round-trip receipt.
  *
  * Usage: SPARK_DRIVER_MEM=64g tools/run_main.sh graft.tools.StingerWriteTier medium
  */
object StingerWriteTier {
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
      val g = Graph.fromRawEdges(spark.read.parquet(edgesPath))
      // the symmetrized weighted adjacency — the view the reference's .g
      // CSR holds (both orientations, weight = pair multiplicity)
      val src = g.preSymmetrized.getOrElse(g.edges)
      val ne = src.count()
      val out = s"target/graft-data/stinger-$tier.g"
      val t0 = System.nanoTime()
      StingerFiles.writeGraph(src, out)
      val wSec = (System.nanoTime() - t0) / 1e9
      val sizeMb = new java.io.File(out).length() / 1e6
      val t1 = System.nanoTime()
      val back = StingerFiles.readGraph(spark, out, partitions = 32).edges
        .localCheckpoint(true)
      val rSec = (System.nanoTime() - t1) / 1e9
      val extra = back.exceptAll(src).count()
      val missing = src.exceptAll(back).count()
      System.err.println(f"[stinger-write] tier=$tier ne=$ne " +
        f"write=$wSec%.1f s read=$rSec%.1f s size=$sizeMb%.0f MB " +
        f"roundTripDiff=${extra + missing}")
      require(extra + missing == 0, "round-trip mismatch")
      back.unpersist(blocking = false)
      g.preSymmetrized match {
        case Some(sym) => sym.unpersist(blocking = false)
        case None => g.cachedUndirected.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
