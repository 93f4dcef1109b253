package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph._
import graft.ops._
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * Every `queries` entry with a matching `oracleSql` entry is hash-compared
  * against DuckDB at sf0.01 by the driver; entries without oracle SQL get a
  * weaker rows-only check (approximate/probabilistic or generator ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PageRank.fixedIterations(Graph.fromTpch(spark, "/root/testdata/sf0.001"), 5)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- graph core (SURVEY §2 G1..G12) ---
    "graph_build_edges" -> ((s, d) => Graph.fromTpch(s, d).edges),
    "graph_degrees" -> ((s, d) => Degrees(Graph.fromTpch(s, d))),
    "graph_degree_dist" -> ((s, d) => Degrees.distribution(Graph.fromTpch(s, d))),
    "graph_cc" -> ((s, d) => ConnectedComponents(Graph.fromTpch(s, d))),
    "graph_cc_alt" -> ((s, d) => ConnectedComponents.alternating(Graph.fromTpch(s, d))),
    "graph_cc_sizes" -> ((s, d) => ConnectedComponents.sizes(Graph.fromTpch(s, d))),
    "graph_sssp" -> ((s, d) => ShortestPaths.fromMinVertex(Graph.fromTpch(s, d))),
    "graph_sssp_weighted" -> ((s, d) => {
      val g = Graph.fromTpch(s, d)
      val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
      WeightedShortestPaths(g, src)
    }),
    "graph_pagerank5" -> ((s, d) => PageRank.fixedIterations(Graph.fromTpch(s, d), 5)),
    "graph_pagerank_weighted" -> ((s, d) =>
      PageRank.fixedIterationsWeighted(Graph.fromTpch(s, d), 5)),
    "graph_pagerank_conv" -> ((s, d) => PageRank.converged(Graph.fromTpch(s, d))),
    "graph_diameter" -> ((s, d) =>
      ShortestPaths.diameterDoubleSweep(Graph.fromTpch(s, d))),
    "graph_pagerank_ppr" -> ((s, d) =>
      PageRank.personalizedFromMinVertex(Graph.fromTpch(s, d), 5)),
    "graph_landmark_dist" -> ((s, d) =>
      LandmarkDistances(Graph.fromTpch(s, d), k = 4)),
    "graph_betweenness" -> ((s, d) => Betweenness(Graph.fromTpch(s, d), k = 4)),
    "graph_update_edges" -> ((s, d) => EdgeUpdates.updatedGraph(s, d).edges),
    "graph_update_degrees" -> ((s, d) => Degrees(EdgeUpdates.updatedGraph(s, d))),
    // maintain-then-analyze: the same algorithms over the updated graph
    "graph_update_cc" -> ((s, d) =>
      ConnectedComponents(EdgeUpdates.updatedGraph(s, d))),
    "graph_update_pagerank5" -> ((s, d) =>
      PageRank.fixedIterations(EdgeUpdates.updatedGraph(s, d), 5)),
    "graph_update_sssp" -> ((s, d) =>
      ShortestPaths.fromMinVertex(EdgeUpdates.updatedGraph(s, d))),
    "graph_update_sssp_weighted" -> ((s, d) => {
      val g = EdgeUpdates.updatedGraph(s, d)
      val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
      WeightedShortestPaths(g, src)
    }),
    // oracle unroll-depth guards bind only at the SF the driver
    // hash-checks (sf0.01): peel/MIS round counts grow with SF, and at
    // un-checked SFs there is no oracle to protect — the query must not
    // refuse to run there (same principle as graph_coloring below)
    "graph_kcore" -> ((s, d) =>
      KCore(Graph.fromTpch(s, d), k = 32,
        oracleRounds = if (d.contains("sf0.01")) Some(8) else None)),
    "graph_coreness" -> ((s, d) =>
      Coreness(Graph.fromTpch(s, d),
        oracleRounds = if (d.contains("sf0.01")) Some(6) else None)),
    // rounds is a convergence CAP (r11): the loop early-stops at the
    // match fixpoint, so a cap above the productive depth never changes
    // the result — the oracle stays unrolled at 4 (≥ the sf0.01
    // productive depth, guarded below)
    "graph_multicontract" -> ((s, d) =>
      MultiContract(Graph.fromTpch(s, d), rounds = 8, jumps = 4,
        oracleRounds = if (d.contains("sf0.01")) Some(4) else None)),
    // G23b (r13): run-to-best-modularity profile — same contraction
    // machinery, stops at the first non-improving round (prefix rule).
    // The oracle unrolls 4 rounds and selects by the same rule, so the
    // Spark stop round s must satisfy s ≤ 4 ⇔ productive ≤ 3 (the
    // returned map is map_{s−1}; the oracle still needs q_s)
    "graph_multicontract_mod" -> ((s, d) =>
      MultiContract(Graph.fromTpch(s, d), rounds = 8, jumps = 4,
        modularityStop = true,
        oracleRounds = if (d.contains("sf0.01")) Some(3) else None)),
    "graph_lpa" -> ((s, d) => LabelPropagation(Graph.fromTpch(s, d), rounds = 5)),
    "graph_triangles" -> ((s, d) => Triangles.count(Triangles.nationEdges(s, d))),
    // the three part-co-occurrence queries share one memoized enumeration
    // per session (the first consumer pays it; trial-2 fresh sessions
    // re-earn it — see Triangles.partTriCached)
    "graph_triangles_scale" -> ((s, d) => Triangles.partTrianglesScale(s, d)),
    "graph_clustering_coeff" -> ((s, d) => Triangles.partClustering(s, d)),
    "graph_ktruss" -> ((s, d) => Triangles.partKTruss(s, d)),
    // G18b: batch twin of X23's drain — shares one session-memoized
    // triangle list with the stream maintainer in either order
    "graph_ktruss_updated" -> ((s, d) => Triangles.updatedKTruss(s, d)),
    "graph_mis" -> ((s, d) =>
      MaximalIndependentSet(Graph.fromTpch(s, d),
        oracleRounds = if (d.contains("sf0.01")) Some(8) else None)),
    "graph_coloring" -> ((s, d) =>
      GraphColoring(Graph.fromTpch(s, d),
        oracleRounds = if (d.contains("sf0.01")) Some(10) else None)),
    "rmat_gen" -> ((s, _) => RMat.graph(s, RMat.Params(scale = 10)).edges),
    "rmat_actions" -> ((s, _) =>
      RMat.actions(s, RMat.Params(scale = 10), na = 20000L)),
    // --- relational / OLAP (R1..R6) ---
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_revenue" -> ((s, d) => Relational.q3Revenue(s, d)),
    "q5_nation_revenue" -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "q6_forecast" -> ((s, d) => Relational.q6Forecast(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q7_volume_shipping" -> ((s, d) => Relational.q7VolumeShipping(s, d)),
    "q10_returned_items" -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q16_supplier_cnt" -> ((s, d) => Relational.q16SupplierCnt(s, d)),
    "topk_orders_per_cust" -> ((s, d) => Relational.topkOrdersPerCust(s, d)),
    "sessionize" -> ((s, d) => Relational.sessionize(s, d)),
    "events_hourly" -> ((s, d) => Relational.eventsHourly(s, d)),
    "events_asof" -> ((s, d) => Relational.purchaseAsOfClick(s, d)),
    "events_json" -> ((s, d) => Relational.eventsJson(s, d)),
    "events_rollup" -> ((s, d) => Relational.eventsRollup(s, d)),
    "events_moving_avg" -> ((s, d) => Relational.eventsMovingAvg(s, d)),
    "events_funnel" -> ((s, d) => Relational.eventsFunnel(s, d)),
    "events_retention" -> ((s, d) => Relational.eventsRetention(s, d)),
    "events_hopping" -> ((s, d) => Relational.eventsHopping(s, d)),
    "events_interval_join" -> ((s, d) => Relational.eventsIntervalJoin(s, d)),
    "events_pivot" -> ((s, d) => Relational.eventsPivot(s, d)),
    "user_spend_deciles" -> ((s, d) => Relational.userSpendDeciles(s, d)),
    "part_affinity" -> ((s, d) => Relational.partAffinity(s, d)),
    "q22_no_orders" -> ((s, d) => Relational.q22NoOrders(s, d)),
    "q4_priority_check" -> ((s, d) => Relational.q4PriorityCheck(s, d)),
    "q12_ship_priority" -> ((s, d) => Relational.q12ShipPriority(s, d)),
    "q14_promo_effect" -> ((s, d) => Relational.q14PromoEffect(s, d)),
    "q19_disjunct_revenue" -> ((s, d) => Relational.q19DisjunctiveRevenue(s, d)),
    "q20_excess_share" -> ((s, d) => Relational.q20ExcessShare(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => Relational.q2MinCostSupplier(s, d)),
    "q8_market_share" -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q9_product_profit" -> ((s, d) => Relational.q9ProductProfit(s, d)),
    "q11_important_parts" -> ((s, d) => Relational.q11ImportantParts(s, d)),
    "q13_cust_distribution" -> ((s, d) => Relational.q13CustDistribution(s, d)),
    "q15_top_supplier" -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q17_small_qty_revenue" -> ((s, d) => Relational.q17SmallQtyRevenue(s, d)),
    "q21_waiting_suppliers" -> ((s, d) => Relational.q21WaitingSuppliers(s, d)),
    // --- dedup (D1..D5) ---
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshCached(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashBlocked(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "dedup_semantic" -> ((s, d) => Dedup.semantic(s, d)),
    // nClusters=1 ⇒ within-cluster pairs are ALL pairs ≡ D5 (oracle-green twin)
    "dedup_semantic_exhaustive" -> ((s, d) => Dedup.semantic(s, d, nClusters = 1)),
    "dedup_keep_best" -> ((s, d) => Dedup.keepBest(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringContainment(s, d)),
    "dedup_prefix_join" -> ((s, d) => Dedup.prefixFilterJoin(s, d)),
    "dedup_lines" -> ((s, d) => Dedup.lineDedup(s, d)),
    "dedup_substr_exact" -> ((s, d) => Dedup.exactSubstr(s, d)),
    // --- similarity search (S1..S3) ---
    "ann_topk" -> ((s, d) => Similarity.annTopK(s, d)),
    "embeddings_kmeans" -> ((s, d) => Similarity.kmeansAssign(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    // exhaustive-probe settings make the bucketed paths exactly ≡ annTopK,
    // turning the probabilistic pipelines themselves oracle-checkable
    "ann_lsh_exhaustive" -> ((s, d) => Similarity.annLsh(s, d, probeHamming = 8)),
    "ann_ivf_exhaustive" -> ((s, d) => Similarity.annIvf(s, d, nProbe = 16)),
    "ann_graph" -> ((s, d) => Similarity.annGraph(s, d)),
    "ann_graph_exhaustive" -> ((s, d) => Similarity.annGraph(s, d,
      ef = Int.MaxValue, beamWidth = Int.MaxValue, maxHops = 64)),
    "ann_pq_build" -> ((s, d) => Similarity.annPqBuild(s, d)),
    "ann_pq" -> ((s, d) => Similarity.annPq(s, d)),
    "ann_ivfpq" -> ((s, d) => Similarity.annIvfPq(s, d)),
    "ann_ivfpq_exhaustive" -> ((s, d) =>
      Similarity.annIvfPq(s, d, nProbe = 16, rerank = Int.MaxValue)),
    "ann_pq_exhaustive" -> ((s, d) =>
      Similarity.annPq(s, d, rerank = Int.MaxValue)),
    // --- text analysis (T1..T4) ---
    "text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "text_tokens_bpe" -> ((s, d) => Bpe.textTokensBpe(s, d)),
    // T1c: the production-vocabulary kernel apply (broadcast merge table)
    "text_tokens_bpe_full" -> ((s, d) => Bpe.textTokensBpeFull(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.quality(s, d)),
    "text_langid" -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "text_normalize" -> ((s, d) => TextAnalysis.normalize(s, d)),
    "text_ngrams" -> ((s, d) => TextAnalysis.corpusNgrams(s, d)),
    "text_repetition" -> ((s, d) => TextAnalysis.repetition(s, d)),
    "text_pii" -> ((s, d) => TextAnalysis.piiRedact(s, d)),
    "text_inverted_index" -> ((s, d) => TextAnalysis.invertedIndex(s, d)),
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "text_unigram_xent" -> ((s, d) => TextAnalysis.unigramXent(s, d)),
    "text_hll_distinct" -> ((s, d) => TextAnalysis.hllDistinct(s, d)),
    "corpus_dsir" -> ((s, d) => Corpus.dsirWeights(s, d)),
    // --- corpus curation (T8..T10) ---
    "corpus_decontaminate" -> ((s, d) => Corpus.decontaminateQuery(s, d)),
    "corpus_sample" -> ((s, d) => Corpus.sampleStratified(s, d)),
    "corpus_mix" -> ((s, d) => Corpus.mixWeights(s, d)),
    "corpus_bloom_probe" -> ((s, d) => Corpus.bloomProbe(s, d)),
    "corpus_pack" -> ((s, d) => Pack.chunks(s, d)),
    "corpus_curate" -> ((s, d) => Pack.curate(s, d)),
    "stats_profile" -> ((s, d) => Corpus.numericProfile(s, d)),
    // --- multimodal (M1) ---
    "multimodal_meta" -> ((s, d) => Multimodal.extractMeta(s, d)),
    "multimodal_frames" -> ((s, d) => Multimodal.sampleFrames(s, d)),
    "multimodal_phash" -> ((s, d) => Multimodal.perceptualHashQuery(s, d)),
    // --- streaming (X1..X4) ---
    "stream_events_hourly" -> ((s, d) => EventStream.eventsHourly(s, d)),
    "stream_graph_updates" -> ((s, d) => EventStream.maintainGraphStream(s, d)),
    "stream_sessionize" -> ((s, d) => EventStream.sessionizeEventTime(s, d)),
    "stream_hourly_watermarked" -> ((s, d) =>
      EventStream.eventsHourlyWatermarkedFinal(s, d)),
    "stream_dedup_exact" -> ((s, d) => EventStream.dedupExactStream(s, d)),
    "stream_dedup_minhash" -> ((s, d) => EventStream.minhashLshStream(s, d)),
    // X25: probabilistic like ann_ivf (rows-only, declared); the
    // exhaustive twin (nProbe = nLists) is hash-checked below
    "stream_ann_ivf_incremental" -> ((s, d) => EventStream.annIvfStream(s, d)),
    "stream_ann_ivf_exhaustive" -> ((s, d) =>
      EventStream.annIvfStream(s, d, nProbe = 16)),
    // X27: probabilistic like ann_ivfpq (rows-only, declared); the
    // exhaustive twin (nProbe = nLists, rerank ≥ corpus) is hash-checked
    "stream_ann_ivfpq_incremental" -> ((s, d) =>
      EventStream.annIvfPqStream(s, d)),
    "stream_ann_ivfpq_exhaustive" -> ((s, d) =>
      EventStream.annIvfPqStream(s, d, nProbe = 16, rerank = Int.MaxValue)),
    // X28: probabilistic like ann_graph (rows-only, declared); the
    // exhaustive twin (ef = beam = ∞, chain links keep the drained graph
    // connected from entry 0) is hash-checked against brute force
    "stream_ann_graph_incremental" -> ((s, d) =>
      EventStream.annGraphStream(s, d)),
    "stream_ann_graph_exhaustive" -> ((s, d) => EventStream.annGraphStream(
      s, d, ef = Int.MaxValue, beamWidth = Int.MaxValue, maxHops = 64)),
    "stream_events_hopping" -> ((s, d) => EventStream.eventsHopping(s, d)),
    "stream_cms_sketch" -> ((s, d) => EventStream.cmsSketchStream(s, d)),
    "stream_purchase_click_join" -> ((s, d) =>
      EventStream.purchaseClickJoinStream(s, d)),
    "stream_hll_registers" -> ((s, d) => EventStream.hllRegisterStream(s, d)),
    "stream_enriched_revenue" -> ((s, d) =>
      EventStream.enrichedRevenueStream(s, d)),
    "stream_bloom_bits" -> ((s, d) => EventStream.bloomBitsStream(s, d)),
    "stream_degrees_incremental" -> ((s, d) =>
      EventStream.incrementalDegreesStream(s, d)),
    "stream_cc_incremental" -> ((s, d) =>
      EventStream.incrementalCcStream(s, d)),
    "stream_pagerank_incremental" -> ((s, d) =>
      EventStream.incrementalPageRankStream(s, d)),
    "stream_sssp_incremental" -> ((s, d) =>
      EventStream.incrementalSsspStream(s, d)),
    "stream_wsssp_incremental" -> ((s, d) =>
      EventStream.incrementalWssspStream(s, d)),
    "stream_landmark_incremental" -> ((s, d) =>
      EventStream.incrementalLandmarkStream(s, d)),
    "stream_triangles_incremental" -> ((s, d) =>
      EventStream.incrementalTrianglesStream(s, d)),
    "stream_local_cc_incremental" -> ((s, d) =>
      EventStream.incrementalLocalClusteringStream(s, d)),
    "stream_betweenness_incremental" -> ((s, d) =>
      EventStream.incrementalBetweennessStream(s, d)),
    "stream_kcore_incremental" -> ((s, d) =>
      EventStream.incrementalKcoreStream(s, d)),
    "stream_coreness_incremental" -> ((s, d) =>
      EventStream.incrementalCorenessStream(s, d,
        oracleRounds = if (d.contains("sf0.01")) Some(12) else None)),
    "stream_ktruss_incremental" -> ((s, d) =>
      EventStream.incrementalKtrussStream(s, d)),
    "stream_lpa_incremental" -> ((s, d) =>
      EventStream.incrementalLpaStream(s, d)))

  /** DuckDB-equivalent SQL per query key (same column names, types, and
    * rounding as the Spark result — the driver hash-compares).
    */
  def oracleSql: Map[String, String] = Map(
    "graph_build_edges" -> Graph.tpchEdgesSql,
    "graph_degrees" ->
      s"""WITH ${Graph.undirectedCte}
         |SELECT src AS id, count(*) AS degree FROM edges GROUP BY 1""".stripMargin,
    "graph_degree_dist" ->
      s"""WITH ${Graph.undirectedCte},
         |deg AS (SELECT src AS id, count(*) AS degree FROM edges GROUP BY 1)
         |SELECT degree, count(*) AS n_vertices FROM deg GROUP BY 1""".stripMargin,
    "graph_cc" ->
      s"""WITH RECURSIVE ${Graph.undirectedCte},
         |cc(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, cc.lbl FROM cc JOIN edges e ON cc.id = e.src
         |)
         |SELECT id, min(lbl) AS component FROM cc GROUP BY id""".stripMargin,
    "graph_cc_sizes" ->
      s"""WITH RECURSIVE ${Graph.undirectedCte},
         |cc(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, cc.lbl FROM cc JOIN edges e ON cc.id = e.src
         |),
         |comp AS (SELECT id, min(lbl) AS component FROM cc GROUP BY id)
         |SELECT component, count(*) AS size FROM comp GROUP BY 1""".stripMargin,
    "graph_sssp" ->
      s"""WITH RECURSIVE ${Graph.undirectedCte},
         |bfs(id, d) AS (
         |  SELECT (SELECT min(src) FROM edges), 0
         |  UNION
         |  SELECT e.dst, bfs.d + 1 FROM bfs JOIN edges e ON bfs.id = e.src
         |  WHERE bfs.d < 64
         |)
         |SELECT id, CAST(min(d) AS BIGINT) AS dist FROM bfs GROUP BY id""".stripMargin,
    "graph_cc_alt" ->
      s"""WITH RECURSIVE ${Graph.undirectedCte},
         |cc(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, cc.lbl FROM cc JOIN edges e ON cc.id = e.src
         |)
         |SELECT id, min(lbl) AS component FROM cc GROUP BY id""".stripMargin,
    "graph_pagerank5" -> PageRank.unrolledSql(5),
    // r13 (r12 verdict item #7): the converged-PR rows-only carry ends —
    // the Chebyshev unroll stops at ~35 materialized iterates (~4 s in
    // DuckDB at sf0.01 vs the rejected 100+-step power unroll)
    "graph_pagerank_conv" -> PageRank.chebyUnrolledSql(),
    "graph_pagerank_weighted" -> PageRank.unrolledWeightedSql(5),
    "graph_pagerank_ppr" -> PageRank.personalizedSql(5),
    "graph_diameter" -> ShortestPaths.diameterSql(),
    "graph_landmark_dist" -> LandmarkDistances.recursiveSql(4),
    "graph_betweenness" -> Betweenness.unrolledSql(4),
    "graph_update_edges" -> EdgeUpdates.updatedEdgesSql,
    "graph_update_degrees" -> EdgeUpdates.updatedDegreesSql,
    "graph_update_cc" -> EdgeUpdates.updatedCcSql,
    "graph_update_pagerank5" ->
      PageRank.unrolledSql(5, EdgeUpdates.updatedUndirectedCte),
    "graph_update_sssp" -> EdgeUpdates.updatedSsspSql,
    "graph_kcore" -> KCore.unrolledSql(k = 32, rounds = 8),
    "graph_coreness" -> Coreness.unrolledSql(rounds = 6),
    "graph_multicontract" -> MultiContract.unrolledSql(rounds = 4, jumps = 4),
    "graph_multicontract_mod" ->
      MultiContract.modularitySql(rounds = 4, jumps = 4),
    "graph_mis" -> MaximalIndependentSet.unrolledSql(rounds = 8),
    "graph_coloring" -> GraphColoring.unrolledSql(rounds = 10),
    "graph_lpa" -> LabelPropagation.unrolledSql(rounds = 5),
    "graph_triangles" -> Triangles.nationTrianglesSql,
    "graph_triangles_scale" -> Triangles.partTrianglesSql,
    "graph_clustering_coeff" -> Triangles.partClusteringSql,
    "graph_ktruss" -> Triangles.kTrussSql(),
    "graph_ktruss_updated" -> EdgeUpdates.updatedUserKtrussSql(),
    "rmat_gen" -> RMat.unrolledSql(RMat.Params(scale = 10)),
    "rmat_actions" -> RMat.actionsUnrolledSql(RMat.Params(scale = 10), na = 20000L),
    "q1_agg" -> Relational.q1Sql,
    "q3_revenue" -> Relational.q3Sql,
    "q5_nation_revenue" -> Relational.q5Sql,
    "q6_forecast" -> Relational.q6Sql,
    "q18_large_orders" -> Relational.q18Sql(),
    "q7_volume_shipping" -> Relational.q7Sql(),
    "q10_returned_items" -> Relational.q10Sql,
    "q16_supplier_cnt" -> Relational.q16Sql,
    "topk_orders_per_cust" -> Relational.topkSql,
    "sessionize" -> Relational.sessionizeSql,
    "events_hourly" -> Relational.eventsHourlySql,
    "events_asof" -> Relational.asOfSql,
    "events_json" -> Relational.eventsJsonSql,
    "events_rollup" -> Relational.eventsRollupSql,
    "events_moving_avg" -> Relational.eventsMovingAvgSql,
    "events_funnel" -> Relational.eventsFunnelSql,
    "events_retention" -> Relational.eventsRetentionSql,
    "events_hopping" -> Relational.eventsHoppingSql,
    "events_interval_join" -> Relational.eventsIntervalJoinSql,
    "events_pivot" -> Relational.eventsPivotSql,
    "user_spend_deciles" -> Relational.userSpendDecilesSql,
    "part_affinity" -> Relational.partAffinitySql,
    "q22_no_orders" -> Relational.q22Sql,
    "q4_priority_check" -> Relational.q4Sql,
    "q12_ship_priority" -> Relational.q12Sql,
    "q14_promo_effect" -> Relational.q14Sql,
    "q19_disjunct_revenue" -> Relational.q19Sql,
    "q20_excess_share" -> Relational.q20Sql,
    "q2_min_cost_supplier" -> Relational.q2Sql,
    "q8_market_share" -> Relational.q8Sql(),
    "q9_product_profit" -> Relational.q9Sql(),
    "q11_important_parts" -> Relational.q11Sql(),
    "q13_cust_distribution" -> Relational.q13Sql,
    "q15_top_supplier" -> Relational.q15Sql,
    "q17_small_qty_revenue" -> Relational.q17Sql(),
    "q21_waiting_suppliers" -> Relational.q21Sql(),
    "graph_sssp_weighted" -> WeightedShortestPaths.unrolledSql(30),
    "dedup_exact" -> Dedup.exactSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "dedup_minhash_lsh" -> Dedup.ngramJaccardSql(),
    "dedup_simhash" -> Dedup.simhashSql(),
    "dedup_embedding" -> Dedup.embeddingCosineSql(),
    "dedup_clusters" -> Dedup.clustersSql(),
    "dedup_semantic_exhaustive" -> Dedup.embeddingCosineSql(),
    "dedup_keep_best" -> Dedup.keepBestSql(),
    "dedup_substring" -> Dedup.substringContainmentSql(),
    // D10 is exact and complete by the prefix-filter lemma — the all-pairs
    // Jaccard SQL is its oracle, not an approximation bound
    "dedup_prefix_join" -> Dedup.ngramJaccardSql(),
    "dedup_lines" -> Dedup.lineDedupSql(),
    "dedup_substr_exact" -> Dedup.exactSubstrSql(),
    "ann_topk" -> Similarity.annTopKSql(),
    "embeddings_kmeans" -> Similarity.kmeansSql(),
    "ann_lsh_exhaustive" -> Similarity.annTopKSql(),
    "ann_ivf_exhaustive" -> Similarity.annTopKSql(),
    "stream_ann_ivf_exhaustive" -> Similarity.annTopKSql(),
    "stream_ann_ivfpq_exhaustive" -> Similarity.annTopKSql(),
    "stream_ann_graph_exhaustive" -> Similarity.annTopKSql(),
    "ann_pq_exhaustive" -> Similarity.annTopKSql(),
    "ann_graph_exhaustive" -> Similarity.annTopKSql(),
    "ann_pq_build" -> Similarity.annPqBuildSql(),
    "ann_ivfpq_exhaustive" -> Similarity.annTopKSql(),
    "text_tokens" -> TextAnalysis.tokenCountsSql,
    "text_tokens_bpe" -> Bpe.textTokensBpeSql(),
    "text_tokens_bpe_full" -> Bpe.textTokensBpeFullSql(),
    "text_quality" -> TextAnalysis.qualitySql,
    "text_langid" -> TextAnalysis.langIdSql,
    "text_fingerprint" -> TextAnalysis.fingerprintSql,
    "text_tfidf" -> TextAnalysis.tfidfSql(),
    "text_normalize" -> TextAnalysis.normalizeSql,
    "text_ngrams" -> TextAnalysis.corpusNgramsSql(),
    "text_repetition" -> TextAnalysis.repetitionSql,
    "text_pii" -> TextAnalysis.piiRedactSql,
    "text_inverted_index" -> TextAnalysis.invertedIndexSql(),
    "text_heavy_hitters" -> TextAnalysis.heavyHittersSql(),
    "text_unigram_xent" -> TextAnalysis.unigramXentSql,
    "text_hll_distinct" -> TextAnalysis.hllDistinctSql,
    "corpus_dsir" -> Corpus.dsirSql(),
    "corpus_decontaminate" -> Corpus.decontaminateSql(),
    "corpus_sample" -> Corpus.sampleStratifiedSql,
    "corpus_mix" -> Corpus.mixWeightsSql(),
    "corpus_bloom_probe" -> Corpus.bloomProbeSql,
    "corpus_pack" -> Pack.chunksSql(),
    "corpus_curate" -> Pack.curateSql(),
    "stats_profile" -> Corpus.numericProfileSql,
    "multimodal_meta" -> Multimodal.extractMetaSql,
    "multimodal_frames" -> Multimodal.sampleFramesSql,
    "multimodal_phash" -> Multimodal.perceptualHashSql,
    "stream_events_hourly" -> EventStream.eventsHourlySql,
    "stream_graph_updates" -> EdgeUpdates.updatedEdgesSql,
    "stream_sessionize" -> Relational.sessionizeSql,
    "stream_hourly_watermarked" -> EventStream.eventsHourlySql,
    "stream_dedup_exact" -> Dedup.exactSql,
    "stream_dedup_minhash" -> Dedup.ngramJaccardSql(),
    "stream_events_hopping" -> EventStream.eventsHoppingSql,
    "stream_cms_sketch" -> TextAnalysis.cmsSketchSql,
    "stream_purchase_click_join" -> EventStream.purchaseClickJoinSql,
    "stream_hll_registers" -> TextAnalysis.hllRegistersSql,
    "stream_enriched_revenue" -> EventStream.enrichedRevenueSql,
    "stream_bloom_bits" -> EventStream.bloomBitsSql,
    "stream_degrees_incremental" -> EdgeUpdates.updatedDegreesSql,
    "stream_cc_incremental" -> EdgeUpdates.updatedCcSql,
    // X15 drains to exactly the batch G10c result — same oracle
    "stream_pagerank_incremental" ->
      PageRank.unrolledSql(5, EdgeUpdates.updatedUndirectedCte),
    // X16 drains to exactly the batch G10d result — same oracle
    "stream_sssp_incremental" -> EdgeUpdates.updatedSsspSql,
    "graph_update_sssp_weighted" -> EdgeUpdates.updatedWssspSql(),
    "stream_wsssp_incremental" -> EdgeUpdates.updatedWssspSql(),
    "stream_landmark_incremental" -> EdgeUpdates.updatedLandmarkSql(),
    "stream_triangles_incremental" -> EdgeUpdates.updatedUserTrianglesSql,
    "stream_local_cc_incremental" -> EdgeUpdates.updatedUserLocalCcSql,
    // X21 drains to exactly the batch G22 result over the updated graph
    "stream_betweenness_incremental" ->
      Betweenness.unrolledSql(4, 8, EdgeUpdates.updatedUndirectedCte),
    // X22 drains to exactly the batch G13 result over the updated graph
    "stream_kcore_incremental" ->
      KCore.unrolledSql(32, 8, EdgeUpdates.updatedUndirectedCte),
    // X26 drains to exactly the batch G13b result over the updated graph
    // (measured 9 cold rounds at sf0.01; 12 idempotent rounds unrolled)
    "stream_coreness_incremental" ->
      Coreness.unrolledSql(12, EdgeUpdates.updatedUndirectedCte),
    // X23 drains the maintained triangle list into G18's truss peel
    "stream_ktruss_incremental" -> EdgeUpdates.updatedUserKtrussSql(),
    // X24 drains to exactly the batch G14 result over the updated graph
    "stream_lpa_incremental" ->
      LabelPropagation.unrolledSql(5, EdgeUpdates.updatedUndirectedCte))
}
