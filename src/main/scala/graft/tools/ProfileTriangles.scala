package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.Triangles

/** Dev-only: time each stage of the oriented triangle count separately —
  * built from the same Triangles helpers the production pipeline uses.
  */
object ProfileTriangles {
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

    val pe = Triangles.partCoOrderEdges(spark, dir)
    val e = time("co-order edges (distinct)")(
      pe.select(col("u"), col("v")).distinct().localCheckpoint(true))
    System.err.println(s"[prof] edges: ${e.count()}")
    val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy(col("id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    time("degrees")(deg.count())
    val ed = e.join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = time("orient + checkpoint")(ed.select(
      when(fwd, col("u")).otherwise(col("v")).as("a"),
      when(fwd, col("v")).otherwise(col("u")).as("b"),
      when(fwd, col("dv")).otherwise(col("du")).as("bd"))
      .localCheckpoint(true))
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.bd") < col("e2.bd") ||
            (col("e1.bd") === col("e2.bd") && col("e1.b") < col("e2.b"))))
      .select(col("e1.b").as("x"), col("e2.b").as("y"))
    val nw = time("wedge join")(wedges.count())
    System.err.println(s"[prof] wedges: $nw")
    val exy = o.select(col("a").as("x"), col("b").as("y"))
    time("closing join SMJ")(wedges.join(exy, Seq("x", "y")).count())
    time("closing join shuffle_hash")(
      wedges.join(exy.hint("shuffle_hash"), Seq("x", "y")).count())
    time("closing join broadcast")(
      wedges.join(broadcast(exy), Seq("x", "y")).count())
    val wc = wedges.groupBy(col("x"), col("y"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("wc"))
    time("closing join preagg+hash")(wc.join(exy.hint("shuffle_hash"),
      Seq("x", "y")).agg(sum(col("wc"))).count())
    time("full orientedCount")(
      Triangles.orientedCount(Triangles.partCoOrderEdges(spark, dir)).count())
    spark.stop()
  }
}
