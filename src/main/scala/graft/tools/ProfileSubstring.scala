package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Corpus, Dedup}

/** Dev-only: time each stage of the D9 substring-containment pipeline. */
object ProfileSubstring {
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

    time("warmup: docs count")(Tables.documents(spark, dir).count())
    // local copy of Corpus.wordNgrams (private[ops]), slice formulation
    val n = Dedup.ContainNgram
    val t = split(trim(lower(col("text"))), "\\s+")
    val wordNgrams = when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val p = spark.sparkContext.defaultParallelism
    val docs0 = Tables.documents(spark, dir)
    val docs = if (docs0.rdd.getNumPartitions < p) docs0.repartition(p) else docs0
    val grams = docs
      .select(col("doc_id"), explode(wordNgrams).as("gram"))
    time("explode grams count")(System.err.println(grams.count()))
    val hashed = grams.select(col("doc_id"), xxhash64(col("gram")).as("gh"),
      xxhash64(col("gram"), lit("graft.contain.2")).as("gh2"))
    time("hash count")(hashed.count())
    val g = time("distinct+checkpoint")(hashed.distinct().localCheckpoint(true))
    val inter = g.as("a").join(g.as("b"),
        col("a.gh") === col("b.gh") && col("a.gh2") === col("b.gh2") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("self-join inter count")(System.err.println(inter.count()))
    time("full query")(Dedup.substringContainment(spark, dir).count())
    time("full query again")(Dedup.substringContainment(spark, dir).count())
    spark.stop()
  }
}
