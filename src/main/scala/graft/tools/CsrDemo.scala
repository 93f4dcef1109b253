package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.RMat
import graft.sources.StingerFiles

/** Generate an R-MAT graph, write it in the reference's binary CSR format,
  * read it back distributed, and run degrees over it — end-to-end interop
  * demo for the STINGER file source.
  */
object CsrDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_csr_demo.bin")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = RMat.graph(spark, RMat.Params(scale = 10))
    StingerFiles.writeGraph(g.edges, out)
    val back = StingerFiles.readGraph(spark, out, partitions = 8)
    val same = g.edges.exceptAll(back.edges).count() == 0 &&
      back.edges.exceptAll(g.edges).count() == 0
    println(s"edges=${back.edges.count()} roundtrip_equal=$same")
    graft.graph.Degrees(back).orderBy(org.apache.spark.sql.functions.desc("degree"))
      .show(5)
    spark.stop()
  }
}
