package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Vertex degrees over the undirected distinct-edge view.
  * One shuffle (groupBy src) with map-side combine.
  */
object Degrees {
  /** (id, degree) — number of distinct neighbors. */
  def apply(g: Graph): DataFrame =
    g.undirected.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))

  /** (degree, n_vertices) histogram — the reference charts degree
    * distributions of R-MAT graphs (ref: README.md R-MAT section).
    */
  def distribution(g: Graph): DataFrame =
    apply(g).groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))
}

/** Connected components via Shiloach-Vishkin-style min-label propagation
  * (ref: tests/bagel/App.scala:211-223 — each vertex repeatedly adopts the
  * min component id heard from neighbors, halting when stable).
  *
  * Spark-first shape: labels is a (id, component) DataFrame; each round is
  * one shuffle-join (edges ⋈ labels on src) + one shuffle-agg (min per dst).
  * Converges in O(diameter) rounds (small-world graphs: ~10). Lineage is
  * truncated every round with an eager localCheckpoint, else the plan grows
  * exponentially. Convergence check: Σ labels is strictly decreasing until
  * fixpoint (labels only ever decrease), so one extra scalar agg per round
  * — no second join.
  *
  * 100 TB note: for pathological diameters the upgrade is alternating
  * large-star/small-star (Kiveris et al., MapReduce CC), same DataFrame
  * skeleton; hub skew in edges⋈labels is handled by AQE skew-join.
  */
object ConnectedComponents {
  def apply(g: Graph, maxIter: Int = 50): DataFrame = {
    val edges = g.undirected.persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var lastSum = labels.agg(sum(col("component"))).head().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val heard = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(heard)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("component"))).head().getLong(0)
      converged = s == lastSum
      lastSum = s
      labels = next
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** (component, size) for each component. */
  def sizes(g: Graph): DataFrame =
    apply(g).groupBy(col("component")).agg(count(lit(1)).as("size"))
}

/** Unweighted single-source shortest paths via breadth-first frontier
  * expansion (ref: tests/networkx/test_python.py:111,
  * tests/bagel/App.scala:225-243 — distance from vertex 0, BFS style).
  *
  * The frontier is a DataFrame; each round joins frontier ⋈ edges (semi-join
  * shaped: work ∝ frontier size, not graph size) and anti-joins the visited
  * set. Returns only reached vertices, matching networkx
  * single_source_shortest_path_length semantics.
  */
object ShortestPaths {
  /** Distances from the minimum vertex id (the analog of "vertex 0" on a
    * graph whose ids need not start at 0).
    */
  def fromMinVertex(g: Graph, maxIter: Int = 64): DataFrame = {
    val edges = g.undirected.persist(StorageLevel.MEMORY_AND_DISK)
    // one O(1) driver-side scalar: the source id
    val source = edges.agg(min(col("src"))).head().getLong(0)
    run(g, edges, source, maxIter)
  }

  def apply(g: Graph, source: Long, maxIter: Int = 64): DataFrame = {
    val edges = g.undirected.persist(StorageLevel.MEMORY_AND_DISK)
    run(g, edges, source, maxIter)
  }

  private def run(g: Graph, edges: DataFrame, source: Long, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0L)).toDF("id", "dist").localCheckpoint(true)
    var frontier = dist
    var d = 0L
    var done = false
    while (!done && d < maxIter) {
      d += 1
      val next = frontier.join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("dist", lit(d))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        dist = dist.union(next).localCheckpoint(true)
        frontier = next
      }
    }
    edges.unpersist()
    dist
  }
}

/** PageRank, vertex-parallel, the Bagel reference formula
  * (ref: tests/bagel/App.scala:245-259):
  *   pr'(v) = (1-d)/nv + d * Σ_{u→v} pr(u)/outdeg(u),  d = 0.85,
  * initial pr = 1/nv, over the symmetrized edge set (so no dangling
  * vertices: every vertex has outdeg ≥ 1).
  *
  * Each iteration: ranks ⋈ degrees (same key, co-partitioned) ⋈ edges on
  * src, aggregate on dst — two shuffles, both on vertex id, so the exchange
  * is reused across iterations. Ranks is a |V|-row table, orders of
  * magnitude smaller than edges.
  */
object PageRank {
  val Damping = 0.85

  /** Fixed-iteration variant (oracle-checkable: the driver's DuckDB oracle
    * unrolls the same 5 iterations in SQL). Returns (id, pr) rounded to 8dp.
    */
  def fixedIterations(g: Graph, iterations: Int = 5): DataFrame =
    run(g, iterations, tol = 0.0)._1

  /** Tolerance-converged variant: stops when Σ|Δpr| < tol (the reference
    * converges on epsilon=1e-8 total delta, App.scala:164).
    */
  def converged(g: Graph, tol: Double = 1e-8, maxIter: Int = 100): DataFrame =
    run(g, maxIter, tol)._1

  private def run(g: Graph, maxIter: Int, tol: Double): (DataFrame, Int) = {
    val edges = g.undirected.persist(StorageLevel.MEMORY_AND_DISK)
    val degrees = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nv = degrees.count().toDouble
    var ranks = degrees.select(col("id"), lit(1.0 / nv).as("pr")).localCheckpoint(true)
    var i = 0
    var delta = Double.MaxValue
    while (i < maxIter && (tol == 0.0 || delta > tol)) {
      val contribs = ranks.join(degrees, "id")
        .join(edges, col("id") === edges("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      val next = degrees.select(col("id"))
        .join(contribs, col("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit((1.0 - Damping) / nv) + lit(Damping) * coalesce(col("msg"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      if (tol > 0.0) {
        delta = next.as("n").join(ranks.as("o"), "id")
          .agg(sum(abs(col("n.pr") - col("o.pr")))).head().getDouble(0)
      }
      ranks = next
      i += 1
    }
    edges.unpersist(); degrees.unpersist()
    (ranks.select(col("id"), round(col("pr"), 8).as("pr")), i)
  }

  /** DuckDB oracle: the same fixed iterations unrolled as plain SQL CTEs. */
  def unrolledSql(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""pr$k AS (
         |  SELECT v.id, (1 - 0.85) / (SELECT n FROM nv) + 0.85 * coalesce(s.msg, 0) AS pr
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.pr / d.outdeg) AS msg
         |    FROM edges e JOIN pr${k - 1} p ON e.src = p.id JOIN deg d ON e.src = d.id
         |    GROUP BY 1) s ON v.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Graph.undirectedCte},
       |verts AS (SELECT DISTINCT src AS id FROM edges),
       |nv AS (SELECT count(*) AS n FROM verts),
       |deg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY 1),
       |pr0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS pr FROM verts),
       |$iters
       |SELECT id, round(pr, 8) AS pr FROM pr$iterations""".stripMargin
  }
}
