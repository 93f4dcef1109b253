package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{EdgeUpdates, Graph}

/** Dev-only A/B: the reference "update rate" workload at an R-MAT tier —
  * broadcast-delta apply vs the co-shuffled full-outer merge, inputs
  * pre-materialized exactly as RmatTier times it.
  * Usage: runMain graft.tools.UpdateLargeAb [scale] [na]
  */
object UpdateLargeAb {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(24)
    val na = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (edgesPath, actionsPath) =
      graft.RmatTier.ensureData(spark, scale, na, "target/graft-data")
    val raw = spark.read.parquet(edgesPath)
    val base = Graph(raw.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))).edges.localCheckpoint(true)
    val ne = base.count()
    val actions = spark.read.parquet(actionsPath).localCheckpoint(true)
    val naActual = actions.count()
    System.err.println(s"[ab] base=$ne edges, actions=$naActual")
    def time(label: String)(b: org.apache.spark.sql.DataFrame,
        bd: Boolean, shj: Boolean): Unit = {
      val t0 = System.nanoTime()
      val n = EdgeUpdates.applyAnnotatedPath(b, actions, bd, shj)
        .filter(col("weight") > 0L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[ab] $label%-14s $sec%7.2f s  ${naActual / sec}%10.0f act/s  ($n edges)")
    }
    // declarative floor (r13 verdict item #8): every relational apply is
    // ≥ ONE pass over the base (Spark has no in-place mutable adjacency
    // to patch O(|actions|)-style like native STINGER) — so the honest
    // comparison for the merge is scan+count time over the same base,
    // same filter shape, zero update logic. If the best merge ≈ floor+ε,
    // the formulation is done and the residual gap to the native engine
    // is the in-place-index advantage, not a plan deficiency.
    def floor(label: String)(b: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = b.filter(col("weight") > 0L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[ab] $label%-14s $sec%7.2f s  ${naActual / sec}%10.0f act/s  ($n edges)")
    }
    floor("scan floor")(base)
    time("smj")(base, bd = false, shj = false)
    time("shj")(base, bd = false, shj = true)
    time("delta")(base, bd = true, shj = false)
    // co-partitioned base (untimed layout, the reference engines' native
    // indexed-graph analog): the merge exchanges only the action delta
    val coBase = graft.core.Partitioning.cachedSizedBy(
      spark.read.parquet(edgesPath).groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("weight")), Seq("src", "dst"))
    floor("copart floor")(coBase)
    time("copart smj")(coBase, bd = false, shj = false)
    time("copart shj")(coBase, bd = false, shj = true)
    time("copart shj 2")(coBase, bd = false, shj = true)
    floor("copart floor2")(coBase)
    spark.stop()
  }
}
