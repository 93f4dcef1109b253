package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Dev-only: time each stage of the MinHash+LSH pipeline separately —
  * built from the same Dedup helpers the production pipeline uses, so the
  * profile cannot drift from the measured code.
  */
object ProfileMinhash {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val sigs = Dedup.signatures(docs).persist()
    time("signatures")(sigs.count())
    val bands = Dedup.bandTable(sigs).persist()
    time("banding")(bands.count())
    val cands = Dedup.candidatePairs(bands).persist()
    val nc = time("candidate join")(cands.count())
    System.err.println(s"[prof] candidates: $nc")
    val candIds = cands.select(col("id_a").as("doc_id"))
      .union(cands.select(col("id_b").as("doc_id"))).distinct()
    val sh = Dedup.shingleRowsOf(docs.join(broadcast(candIds), "doc_id"))
    time("verify shingles")(sh.count())

    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("full minhashLsh 2nd")(Dedup.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
