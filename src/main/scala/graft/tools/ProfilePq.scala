package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Dev-only sweep of the PQ-ANN operating point (m × codebookK × rerank)
  * at one SF: recall@5 vs the exact baseline per point.
  * Usage: runMain graft.tools.ProfilePq [dir]
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = Similarity.annTopK(spark, dir).localCheckpoint(true)
    for (m <- Seq(4, 8, 16); k <- Seq(16, 32); rr <- Seq(16, 64, 128)) {
      val t0 = System.nanoTime()
      val r = Similarity.recallAtK(exact,
        Similarity.annPq(spark, dir, m = m, codebookK = k, rerank = rr))
      System.err.println(f"[pq] m=$m%-3d k=$k%-3d rerank=$rr%-4d " +
        f"recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%5.1f s")
    }
    spark.stop()
  }
}
