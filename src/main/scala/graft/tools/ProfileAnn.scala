package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Dev-only: sweep ANN operating points and print recall@5 vs the exact
  * baseline plus the corpus fraction each point scans — the recall/scan
  * trade-off curve that picks the published operating points.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = Similarity.annTopK(spark, dir).localCheckpoint(true)
    for (nBits <- Seq(4, 6, 8); ph <- Seq(1, 2, 3, 4)) {
      val probes = (0L until (1L << nBits))
        .count(m => java.lang.Long.bitCount(m) <= ph)
      val frac = probes.toDouble / (1L << nBits)
      val r = Similarity.recallAtK(exact,
        Similarity.annLsh(spark, dir, nBits = nBits, probeHamming = ph))
      System.err.println(f"[ann] lsh nBits=$nBits ph=$ph scan=$frac%.2f recall@5=$r%.3f")
    }
    for (nLists <- Seq(16, 32); nProbe <- Seq(4, 6, 8, 10, 12)) {
      if (nProbe <= nLists) {
        val r = Similarity.recallAtK(exact,
          Similarity.annIvf(spark, dir, nLists = nLists, nProbe = nProbe))
        System.err.println(
          f"[ann] ivf nLists=$nLists nProbe=$nProbe scan=${nProbe.toDouble / nLists}%.2f recall@5=$r%.3f")
      }
    }
    spark.stop()
  }
}
