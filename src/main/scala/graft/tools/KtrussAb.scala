package graft.tools

/** A/B receipt for the r10 judge item #6 (cut graph_ktruss): the truss
  * peel's thin-tail strategy — the serial single-task LOCAL TAIL (r11) at
  * several switch thresholds vs staying on the decrement-maintained list
  * rounds for the whole peel (threshold 0). Same enumeration (paid once,
  * outside the timer), same peel fixpoint; only the tail mechanics
  * differ. Historical context: the r9 wedge-probe tail this replaced
  * measured threshold-INSENSITIVE 10.5-13 s here (r11 session logs) —
  * every distributed strategy pays the same ~1 s/round barrier+scan
  * floor, which is why the tail had to leave the cluster schedule
  * entirely rather than probe differently.
  *
  * Run: sbt "runMain graft.tools.KtrussAb /root/testdata/sf0.1"
  */
object KtrussAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.sparkAt(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.graph.Triangles
    val tri = Triangles.canonicalTriangleList(
      Triangles.partCoOrderEdges(spark, dir)).localCheckpoint(true)
    System.err.println(s"[ktruss-ab] triangles: ${tri.count()}")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[ktruss-ab] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
          f"  ($n rows)")
    }
    // trial 1 warms JIT; trials 2-3 are the receipt
    (1 to 3).foreach { trial =>
      System.err.println(s"[ktruss-ab] --- trial $trial ---")
      Seq(("local@50000 (shipped)", 50000L), ("local@5000", 5000L),
        ("never-local", 0L)).foreach {
        case (label, thr) => timed(label)(
          Triangles.kTrussFrom(tri, 5, 30, wedgeThreshold = thr).count())
      }
    }
    spark.stop()
  }
}
