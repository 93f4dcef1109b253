package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Dev-only S7 tuning: recall@3 + wall seconds per (beamWidth, ef, m)
  * config at one SF dir, plus the exhaustive-twin equality check.
  * Usage: runMain graft.tools.ProfileAnnGraph [sfDir]
  */
object ProfileAnnGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = Similarity.annTopK(spark, dir, k = 3, nQueries = 10)
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val full = Similarity.annGraph(spark, dir, k = 3, nQueries = 10,
      ef = Int.MaxValue, beamWidth = Int.MaxValue, maxHops = 64)
    val miss = exact.exceptAll(full).count() + full.exceptAll(exact).count()
    System.err.println(f"[s7] twin diff=$miss (want 0)  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    for ((b, ef, m) <- Seq((8, 192, 12), (48, 192, 12), (64, 256, 12),
        (96, 256, 16), (128, 384, 16))) {
      val t = System.nanoTime()
      val got = Similarity.annGraph(spark, dir, k = 3, nQueries = 10,
        m = m, ef = ef, beamWidth = b, maxHops = 32)
      val r = Similarity.recallAtK(exact, got)
      System.err.println(f"[s7] B=$b%3d ef=$ef%3d m=$m%2d  recall@3=$r%.3f  ${(System.nanoTime() - t) / 1e9}%6.1f s")
    }
    spark.stop()
  }
}
