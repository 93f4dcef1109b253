package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.graph.{EdgeUpdates, Graph}

/** Update-rate sweep: replays the action log against the base graph in
  * sequential blocks of varying size and reports edges/sec per block
  * size — the reference's "Update Rate" methodology (ref:
  * tests/networkx/test_python.py:139-151 applies actions in NUM_BLOCKS
  * batches and times the replay; the charts in make_graphs.py plot the
  * resulting rate). Small blocks measure per-batch overhead (the
  * streaming/incremental regime), one big block measures bulk throughput.
  */
object UpdateRateSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val actions = EdgeUpdates.actionsFromEvents(spark, sfDir).localCheckpoint(true)
    val na = actions.count()
    val base = Graph.fromTpch(spark, sfDir).edges.localCheckpoint(true)
    base.count() // untimed materialization (the sweep times updates only)
    val blockSizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(na, na / 10, na / 100).filter(_ > 0).distinct
    val results = blockSizes.map { bs =>
      val nBlocks = ((na + bs - 1) / bs).toInt
      val t0 = System.nanoTime()
      val step = bs
      var edges = base
      (0 until nBlocks).foreach { i =>
        val chunk = actions.filter(col("action_id") >= i * step &&
          col("action_id") < (i + 1) * step)
        edges = EdgeUpdates(edges, chunk).localCheckpoint(true)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val rate = na / sec
      System.err.println(f"[sweep] block=$bs%-8d blocks=$nBlocks%-5d $sec%7.2f s  $rate%12.1f actions/s")
      s""""$bs": $rate"""
    }
    println(s"""{"metric":"update_rate","unit":"actions_per_sec","na":$na,"rates":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
