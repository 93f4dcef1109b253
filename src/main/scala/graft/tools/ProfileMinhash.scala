package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Dev-only: time each stage of the MinHash+LSH pipeline separately. */
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

    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
      .persist()
    time("shingle explode")(sh.count())

    val hashed = sh.select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val sigCols = (0 until Dedup.NumHashes).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"mh$i"))
    val sigs = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*).persist()
    time("minhash agg")(sigs.count())

    val bandStructs = (0 until Dedup.NumBands).map { j =>
      val rowCols = (0 until Dedup.BandRows).map(r => col(s"mh${Dedup.BandRows * j + r}"))
      struct(lit(j).as("band"), xxhash64(rowCols: _*).as("sig"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .persist()
    time("banding")(bands.count())

    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct().persist()
    val nc = time("candidate join")(cands.count())
    System.err.println(s"[prof] candidates: $nc")

    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
