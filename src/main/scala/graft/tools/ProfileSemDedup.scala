package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup

/** Dev-only sweep of SemDeDup's operating point (nClusters × nAssign) at
  * one SF: pair recall vs the exhaustive nClusters=1 twin, candidate-pair
  * volume, and wall time per point — the ANN-tuning methodology
  * (ProfileAnn) applied to D8.
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.ProfileSemDedup
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = Dedup.semantic(spark, sfDir, nClusters = 1)
      .select("id_a", "id_b").localCheckpoint(true)
    val nExact = exact.count()
    System.err.println(s"[semdedup] exhaustive pairs: $nExact")
    for (nc <- Seq(4, 8, 16, 32); na <- Seq(2, 3, 4)) {
      val t0 = System.nanoTime()
      val got = Dedup.semantic(spark, sfDir, nClusters = nc, nAssign = na)
        .select("id_a", "id_b").localCheckpoint(true)
      val n = got.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hit = got.join(exact, Seq("id_a", "id_b"), "left_semi").count()
      System.err.println(
        f"[semdedup] nc=$nc%-3d na=$na recall=${hit.toDouble / nExact}%.3f " +
          f"pairs=$n%-6d $sec%6.1f s")
    }
    spark.stop()
  }
}
