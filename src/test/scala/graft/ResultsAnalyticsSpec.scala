package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ResultsAnalytics

class ResultsAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val resultsDir = "/root/reference/results"

  test("parses the reference's real results files") {
    assume(new java.io.File(resultsDir).isDirectory)
    val runs = ResultsAnalytics.load(spark, resultsDir)
    assert(runs.count() > 0)
    // every file yields a parsed run object (no nulls from bad parses)
    assert(runs.filter(col("nv").isNull).count() == 0)
  }

  test("metrics long form covers the six reference charts") {
    assume(new java.io.File(resultsDir).isDirectory)
    val m = ResultsAnalytics.metrics(ResultsAnalytics.load(spark, resultsDir))
    val names = m.select("metric").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("build", "sv", "pr", "sssp", "update", "mem"))
  }

  test("charts html renders one section per populated metric") {
    assume(new java.io.File(resultsDir).isDirectory)
    val html = ResultsAnalytics.chartsHtml(spark, resultsDir)
    Seq("Initial Graph Construction", "Connected Components", "Page Rank",
      "Single Source Shortest Path", "Update Rate", "Memory Usage")
      .foreach(t => assert(html.contains(t), s"missing chart: $t"))
    assert(html.contains("<svg") && html.contains("stinger"))
  }

  test("summary ranks each metric best-first with best=1.0 relative") {
    assume(new java.io.File(resultsDir).isDirectory)
    val s = ResultsAnalytics.summary(spark, resultsDir).collect()
    val byMetric = s.groupBy(_.getString(0))
    byMetric.foreach { case (metric, rows) =>
      val sorted = rows.sortBy(_.getLong(4)) // rank
      // best row is 1.0 relative to itself (null only if the best value is 0)
      assert(sorted.head.isNullAt(5) || sorted.head.getDouble(5) == 1.0)
      val values = sorted.map(_.getDouble(2)).toSeq
      // time/memory rank ascending; rate metrics (update = edges/sec,
      // higher is better) rank descending
      val expected =
        if (ResultsAnalytics.higherIsBetter(metric)) values.sortBy(-_)
        else values.sortBy(identity)
      assert(values == expected, s"$metric not ranked best-first")
      // rel_to_best is the factor worse than best: always >= 1
      assert(sorted.forall(r => r.isNullAt(5) || r.getDouble(5) >= 1.0))
    }
  }
}
