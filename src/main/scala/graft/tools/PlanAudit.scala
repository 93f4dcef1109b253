package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump plan-quality signals per query: parquet pushdown (PushedFilters /
  * ReadSchema), join strategies, exchange count, and whole-stage-codegen
  * coverage. Run after any operator change; findings land in PLANS.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // iterative/streaming queries execute eagerly inside their builders and
    // their final plan is a checkpoint scan — skip, they're audited by hand
    val skip = Set("graph_cc", "graph_cc_sizes", "graph_sssp",
      "graph_pagerank5", "graph_pagerank_conv", "graph_lpa",
      "stream_events_hourly",
      // streaming mains drain eagerly; their final "plan" is a memory-sink
      // or checkpoint scan — audited by hand like the iterative algorithms
      "stream_graph_updates", "stream_sessionize", "stream_hourly_watermarked",
      "stream_cc_incremental")
    names.filterNot(skip).foreach { name =>
      // audit the real pipeline, not the session-memoized checkpoint the
      // driver entry returns after another query warmed it
      val df = if (name == "dedup_minhash_lsh") graft.ops.Dedup.minhashLsh(spark, dir)
        else graft.SparkEntry.queries(name)(spark, dir)
      df.count() // materialize so AQE's final plan (incl. codegen) is visible
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct
      val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq.distinct
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
        .map(j => j -> j.r.findAllIn(plan).size).filter(_._2 > 0)
      val exchanges = "Exchange ".r.findAllIn(plan).size
      val codegen = "codegen id : \\d+".r.findAllIn(plan).toSeq.distinct.size
      println(s"== $name")
      pushed.foreach(p => println(s"   $p"))
      schemas.foreach(s => println(s"   ${s.take(150)}"))
      println(s"   joins=${joins.map { case (k, v) => s"$k:$v" }.mkString(",")} " +
        s"exchanges=$exchanges codegenSpans=$codegen")
    }
    spark.stop()
  }
}
