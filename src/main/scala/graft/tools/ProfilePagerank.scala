package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.Graph

/** Dev-only: dissect PageRank iteration strategies at sf0.1.
  * args: [dir] [nPart] [mode: bc|shuffle]
  */
object ProfilePagerank {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nPart = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val mode = args.drop(2).headOption.getOrElse("bc")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", nPart)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hash-partition on src so a src-keyed join needs no edges exchange
    val edges = Graph.fromTpch(spark, dir).undirected
      .repartition(nPart, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    time("edges materialize")(edges.count())
    val degrees = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg")).persist(StorageLevel.MEMORY_AND_DISK)
    val nv = time("degrees materialize")(degrees.count()).toDouble
    var state = degrees.select(col("id"), col("outdeg"), lit(1.0 / nv).as("pr"))
      .localCheckpoint(true)

    def iterate() = {
      val stateSide = if (mode == "bc") broadcast(state) else state
      val contribs = edges.join(stateSide, col("src") === col("id"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      state.select(col("id"), col("outdeg"), col("pr").as("pr_old"))
        .join(contribs, col("id") === contribs("dst"), "left")
        .select(col("id"), col("outdeg"),
          (lit(0.15 / nv) + lit(0.85) * coalesce(col("msg"), lit(0.0))).as("pr"),
          col("pr_old"))
    }

    (1 to 12).foreach { i =>
      val next = time(s"iter $i checkpoint")(iterate().localCheckpoint(true))
      if (i % 5 == 0) {
        time(s"iter $i delta agg")(
          next.agg(sum(abs(col("pr") - col("pr_old")))).head().getDouble(0))
      }
      state = next.select(col("id"), col("outdeg"), col("pr"))
    }
    spark.stop()
  }
}
