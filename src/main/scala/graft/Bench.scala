package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Excludes `dedup_ngram_jaccard` (the deliberately
  * O(n²) exact-Jaccard oracle baseline — its scalable twin
  * `dedup_minhash_lsh` is benchmarked instead).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "graph_build_edges", "graph_degrees", "graph_degree_dist",
    "graph_cc", "graph_cc_alt", "graph_cc_sizes", "graph_sssp",
    "graph_sssp_weighted",
    "graph_pagerank5", "graph_pagerank_conv",
    "graph_update_edges", "graph_update_degrees",
    "graph_triangles", "rmat_gen",
    "q1_agg", "q3_revenue", "q5_nation_revenue",
    "q6_forecast", "q18_large_orders",
    "topk_orders_per_cust", "sessionize", "events_hourly",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding",
    "ann_topk", "ann_lsh", "ann_ivf",
    "text_tokens", "text_quality", "text_langid", "text_fingerprint",
    "text_tfidf", "text_ngrams", "text_normalize",
    "multimodal_meta", "multimodal_frames", "stream_events_hourly")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    // optional args: run only the named queries (dev iteration)
    val toRun = if (args.nonEmpty) args.toSeq else headline
    // untimed JIT/codegen warmup so the first timed query isn't charged
    // for JVM startup (the reference harness times workloads, not startup)
    try qs("q1_agg")(spark, sfDir).count() catch { case _: Throwable => }
    val results = toRun.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val ok = try { qs(name)(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      // a crashed query must not masquerade as a fast success: record -1
      name -> (if (ok) sec else -1.0)
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
