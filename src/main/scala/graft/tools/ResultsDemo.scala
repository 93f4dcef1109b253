package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.ResultsAnalytics

/** Print the reference results comparison (the make_graphs.py charts as a
  * table): per metric, packages ranked with slowdown vs the best.
  */
object ResultsDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/reference/results")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ResultsAnalytics.summary(spark, dir)
      .orderBy("metric", "rank").show(100, truncate = false)
    args.drop(1).headOption.foreach { out =>
      ResultsAnalytics.writeCharts(spark, dir, out)
      println(s"charts written to $out")
    }
    spark.stop()
  }
}
