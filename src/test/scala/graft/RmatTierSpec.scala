package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ResultsAnalytics

/** The self-generated R-MAT benchmark tier end-to-end at the reference's
  * tiny SCALE: workloads run, the run file round-trips through the same
  * ResultsAnalytics pipeline that charts the reference's results, and the
  * tier lands in the per-tier comparison next to the reference engines.
  */
class RmatTierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tiny R-MAT tier: five workloads run and chart next to the reference") {
    val tmp = java.nio.file.Files.createTempDirectory("rmat-tier").toString
    val runFile = s"$tmp/run.graft.tiny"
    val secs = RmatTier.run(spark, "tiny", s"$tmp/data", Some(runFile)).toMap
    assert(secs.keySet == Set("rmat_build", "rmat_sv", "rmat_sssp",
      "rmat_pr", "rmat_update"))
    assert(secs.values.forall(_ > 0))

    // the run file parses through the SAME loader the reference files use
    val run = ResultsAnalytics.load(spark, tmp).collect()
    assert(run.length == 1)
    val r = run.head
    assert(r.getAs[Long]("nv") > 900 && r.getAs[Long]("nv") <= 1024) // 2^10 minus isolates
    assert(r.getAs[Long]("na") == 100000L)
    val m = ResultsAnalytics.metrics(ResultsAnalytics.load(spark, tmp))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(Set("build", "sv", "pr", "sssp", "update").subsetOf(m.keySet))
    assert(m("update") > 1000) // a rate, not a time

    // charted per-tier against the reference results: graft appears in the
    // tiny tier ranking
    val refDir = "/root/reference/results"
    assume(new java.io.File(refDir).isDirectory)
    val tiers = ResultsAnalytics.summaryByTier(spark, s"$refDir,$tmp")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tiers.exists { case (t, m2, p) =>
      t == "tiny" && m2 == "build" && p == "graft-spark" })
    // no row escapes the four named tiers (untiered files are excluded)
    assert(tiers.map(_._1).toSet.subsetOf(Set("tiny", "small", "medium", "large")))
  }
}
