package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{ConnectedComponents, Graph}

/** Dev-only A/B: large-tier sv (connected components) state paths, the
  * r11 follow-up to PrLargeAb's CSR receipt. Modes, each a full converged
  * run on one built graph:
  *
  *  - `join` — the frontier min-label + pointer-jump join formulation on
  *    its shuffle-state path (what the large tier ran through r10)
  *  - `csr`  — r11: min-label over the shared per-partition CSR with the
  *    label vector broadcast and driver-side path compression (zero
  *    |E|-row exchange per round; see ConnectedComponents.csrLabels)
  *
  * Both runs print wall + total shuffle bytes (stage-listener totals) and
  * the modes' label tables are compared exactly (exceptAll both ways).
  *
  * Usage: runMain graft.tools.CcLargeAb [scale] [mode...]
  * Needs SPARK_DRIVER_MEM=64g at SCALE 24 (RmatTier heap gate rationale).
  */
object CcLargeAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(24)
    val modes = if (args.length > 1) args.drop(1).toSeq else Seq("csr", "join")
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shufW.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    val edgesPath = s"target/graft-data/rmat-s$scale-edges.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(edgesPath))) {
      val tg = System.nanoTime()
      graft.graph.RMat.edges(spark, graft.graph.RMat.Params(scale))
        .write.parquet(edgesPath)
      System.err.println(f"[ab] edge gen (untimed): ${(System.nanoTime() - tg) / 1e9}%.1f s")
    }
    val g = Graph.fromRawEdges(spark.read.parquet(edgesPath))
    g.cachedUndirected.count()
    val results = modes.map { mode =>
      val w0 = shufW.get()
      val t0 = System.nanoTime()
      val labels = mode match {
        case "csr" =>
          ConnectedComponents.csrLabels(g).getOrElse(
            sys.error("csr gate rejected the tier graph"))
        case "join" => ConnectedComponents.joinLabels(g,
          broadcastVertices = false)
        case other => sys.error(s"unknown mode $other")
      }
      val n = labels.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gb = (shufW.get() - w0) / 1e9
      System.err.println(f"[ab] cc-$mode%-5s $sec%8.2f s  rows=$n  " +
        f"shuffleWrite=$gb%.2f GB")
      mode -> labels.localCheckpoint(true)
    }
    if (results.size == 2) {
      val Seq((m1, a), (m2, b)) = results
      val d = a.exceptAll(b).count() + b.exceptAll(a).count()
      System.err.println(s"[ab] $m1 vs $m2 label diff rows: $d")
      require(d == 0, "state paths disagree")
    }
    spark.stop()
  }
}
