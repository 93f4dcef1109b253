package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.Graph

/** Dev-only: dissect one PageRank iteration at sf0.1. */
object ProfilePagerank {
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

    val nPart = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val edges = Graph.fromTpch(spark, dir).undirected
      .repartition(nPart).persist(StorageLevel.MEMORY_AND_DISK)
    time("edges materialize")(edges.count())
    val degrees = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg")).persist(StorageLevel.MEMORY_AND_DISK)
    val nv = time("degrees materialize")(degrees.count()).toDouble
    var ranks = degrees.select(col("id"), lit(1.0 / nv).as("pr")).localCheckpoint(true)

    def iterate() = {
      val contribs = ranks.join(degrees, "id")
        .join(edges, col("id") === edges("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      ranks.select(col("id"), col("pr").as("pr_old"))
        .join(contribs, col("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(0.15 / nv) + lit(0.85) * coalesce(col("msg"), lit(0.0))).as("pr"),
          col("pr_old"))
    }

    // experiment: does AQE's per-job planning dominate the micro-iterations?
    if (args.length > 2) spark.conf.set("spark.sql.adaptive.enabled", args(2))
    (1 to 10).foreach { i =>
      val next = time(s"iter $i checkpoint")(iterate().localCheckpoint(true))
      val d = time(s"iter $i delta agg")(
        next.agg(sum(abs(col("pr") - col("pr_old")))).head().getDouble(0))
      ranks = next.select(col("id"), col("pr"))
      if (i == 1) System.err.println(s"[prof] delta=$d")
    }
    spark.stop()
  }
}
