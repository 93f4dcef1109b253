package graft

/** Multi-tier benchmark sweep (ref: run_tests.sh runs every engine at
  * tiny/small/medium/large and make_graphs.py charts the per-tier series —
  * the scaling *slope* is the comparison, not one point).
  *
  * Runs the full headline suite once per SF tier in a single session,
  * prints one summary JSON line per tier, and writes one reference-format
  * run file per tier named like the reference's results files
  * (`run.graft.<tier>`) so [[graft.ops.ResultsAnalytics]] charts graft
  * next to each engine at every tier it has data for.
  *
  * Tier mapping is by nearest reference graph size: sf0.01 builds
  * nv≈1.6k/ne≈49k (ref tiny: 1k/14k), sf0.1 builds nv≈16k/ne≈587k
  * (ref small: 33k/504k).
  *
  * Args: `dir=tier` pairs (default `/root/testdata/sf0.01=tiny
  * /root/testdata/sf0.1=small`); optional trailing `charts=<out.html>`
  * renders the combined reference+graft chart set afterwards.
  */
object BenchSweep {
  def main(args: Array[String]): Unit = {
    val (chartArgs, tierArgs) = args.partition(_.startsWith("charts="))
    val tiers: Seq[(String, String)] =
      if (tierArgs.nonEmpty) tierArgs.toSeq.map { a =>
        val Array(d, t) = a.split("=", 2); (d, t)
      }
      else Seq("/root/testdata/sf0.01" -> "tiny",
        "/root/testdata/sf0.1" -> "small")
    val spark = Bench.sparkAt(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_RESULTS_DIR", "target/graft-results"))
    java.nio.file.Files.createDirectories(outDir)
    val lines = tiers.map { case (dir, tier) =>
      System.err.println(s"[bench] === tier $tier ($dir) ===")
      val results = Bench.runSuite(spark, dir, Bench.headline,
        Some(outDir.resolve(s"run.graft.$tier").toString))
      Bench.summaryLine(results, dir)
    }
    lines.foreach(println)
    chartArgs.headOption.map(_.stripPrefix("charts=")).foreach { out =>
      graft.ops.ResultsAnalytics.writeCharts(spark,
        s"/root/reference/results,$outDir", out)
      System.err.println(s"[bench] charts → $out")
    }
    spark.stop()
  }
}
