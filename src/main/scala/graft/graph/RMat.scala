package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, deterministic R-MAT graph generator — the Spark re-expression
  * of the reference's `rmatter` (ref: rmatter/src/rmatter.c; README.md:
  * A=0.55 B=0.1 C=0.1 D=0.25, nv = 2^SCALE, ne = nv * edgeFactor).
  *
  * The reference generates edges sequentially from a seeded RNG. Here each
  * edge id gets its bits from `xxhash64(seed, edge_id, bit_level)`, so
  * generation is embarrassingly parallel (`spark.range` partitions across
  * the cluster), reproducible independent of partitioning, and entirely
  * whole-stage-codegen'd Column arithmetic — no RNG state, no UDF. A
  * 2^30-vertex, 2^33-edge graph is a one-liner on a real cluster.
  */
object RMat {

  final case class Params(
      scale: Int,
      edgeFactor: Int = 8,
      a: Double = 0.55, b: Double = 0.1, c: Double = 0.1, d: Double = 0.25,
      seed: Long = 42L)

  /** Uniform double in [0,1) from a 64-bit hash of (seed, id, salt). */
  private def u01(p: Params, idc: Column, salt: Long): Column =
    (pmod(xxhash64(lit(p.seed), idc, lit(salt)), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))

  /** One R-MAT (src, dst) draw for the given id column; `saltBase` keeps
    * independent draws (edge generation vs. per-attempt action inserts) in
    * disjoint hash streams.
    */
  private def rmatPair(p: Params, idc: Column, saltBase: Long): (Column, Column) = {
    val zero = (lit(0L), lit(0L))
    (0 until p.scale).foldLeft(zero) { case ((s, t), k) =>
      val r = u01(p, idc, saltBase + k)
      // quadrant: A=(0,0) B=(0,1) C=(1,0) D=(1,1) with P = a,b,c,d
      val srcBit = when(r >= p.a + p.b, 1L).otherwise(0L)
      val dstBit = when((r >= p.a && r < p.a + p.b) || r >= p.a + p.b + p.c, 1L)
        .otherwise(0L)
      (s + (srcBit * (1L << k)), t + (dstBit * (1L << k)))
    }
  }

  /** (src, dst) edge table with nv*edgeFactor rows. */
  def edges(spark: SparkSession, p: Params): DataFrame = {
    val ne = (1L << p.scale) * p.edgeFactor
    val (srcCol, dstCol) = rmatPair(p, col("id"), 0L)
    spark.range(ne).select(srcCol.as("src"), dstCol.as("dst"))
  }

  /** Weighted graph: multiplicities collapsed, like the CSR the reference
    * writes (duplicate R-MAT edges accumulate weight).
    */
  def graph(spark: SparkSession, p: Params): Graph =
    Graph(edges(spark, p).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight")))

  // hash-stream salts: edge bits use [0, scale); these stay disjoint
  private val InsertSalt = 1000000L  // action-insert attempt a, level k → +a*scale+k
  private val DeleteSalt = 2000000L  // delete-target draw attempts
  private val IsDelSalt = 3000000L   // insert-vs-delete coin per action
  private val InsertAttempts = 8     // residual self-loop prob ≈ (a+d)^(scale·8)

  /** The insert-vs-delete coin for action id `idc` — a pure function of the
    * action id, so "was earlier action t an insert" needs no join.
    */
  private def isDeleteCoin(p: Params, pDelete: Double, idc: Column): Column =
    u01(p, idc, IsDelSalt) < pDelete

  /** The edge inserted by action `idc` (pure function of the id): up to
    * [[InsertAttempts]] independent R-MAT draws, first non-self-loop wins
    * (the reference redraws until src ≠ dst, rmatter.c:350-353); the
    * vanishing-probability fallback flips the low dst bit.
    */
  private def insertEdge(p: Params, idc: Column): (Column, Column) = {
    val attempts = (0 until InsertAttempts).map { a =>
      val (s, t) = rmatPair(p, idc, InsertSalt + a.toLong * p.scale)
      when(s =!= t, struct(s.as("src"), t.as("dst")))
    }
    val (s0, t0) = rmatPair(p, idc, InsertSalt)
    val chosen = coalesce(
      attempts :+ struct(s0.as("src"), t0.bitwiseXOR(lit(1L)).as("dst")): _*)
    (chosen.getField("src"), chosen.getField("dst"))
  }

  /** R-MAT action stream — the Spark re-expression of the reference's
    * action generator (ref: rmatter/src/rmatter.c:334-373): each action is,
    * with probability 1 − pDelete, an insert of a fresh non-self-loop R-MAT
    * edge; otherwise a delete of a uniformly random choice among (base
    * graph edge ∪ edges inserted by earlier actions), redrawing while the
    * choice lands on an earlier *delete* action (rmatter.c:354-371).
    *
    * The reference walks a sequential seeded RNG; here every draw is a
    * hash of the action id, so the stream is embarrassingly parallel and
    * reproducible, "the edge inserted by action t" is recomputable without
    * a join, and only deletes of *base* edges join against the indexed
    * edge table (shuffle on the uniform index — no skew). Returns
    * (action_id, src, dst, is_del) — the same shape
    * [[graft.sources.StingerFiles.readActions]] decodes, composable with
    * [[EdgeUpdates]] and `StingerFiles.writeActions`.
    */
  def actions(spark: SparkSession, p: Params, na: Long = 100000L,
      pDelete: Double = 0.0625): DataFrame = {
    val base = graph(spark, p).edges
    val ne = base.count()
    // deterministic contiguous edge index: parallel range-partitioned sort
    // + zipWithIndex (no single-partition window)
    import spark.implicits._
    val indexed = base.select(col("src"), col("dst")).orderBy("src", "dst")
      .map(r => (r.getLong(0), r.getLong(1)))
      .rdd.zipWithIndex()
      .map { case ((s, t), i) => (i, s, t) }
      .toDF("idx", "esrc", "edst")
    val id = col("id")
    val isDel = isDeleteCoin(p, pDelete, id)
    val (insSrc, insDst) = insertEdge(p, id)
    // delete target: first accepted draw among InsertAttempts tries —
    // accepted = a base-graph edge, or an earlier action that inserted
    val picks = (0 until InsertAttempts).map { a =>
      val pick = floor(u01(p, id, DeleteSalt + a) *
        (lit(ne.toDouble) + id.cast("double"))).cast("long")
      when(pick < ne || !isDeleteCoin(p, pDelete, pick - ne), pick)
    }
    val pick = coalesce(picks :+ pmod(xxhash64(lit(p.seed), id,
      lit(DeleteSalt + 99L)), lit(math.max(ne, 1L))): _*)
    val acts = spark.range(na).select(id.as("action_id"), isDel.as("is_del"),
      insSrc.as("ins_src"), insDst.as("ins_dst"), pick.as("pick"))
    val inserts = acts.filter(!col("is_del"))
      .select(col("action_id"), col("ins_src").as("src"),
        col("ins_dst").as("dst"), col("is_del"))
    val (priorSrc, priorDst) = insertEdge(p, col("pick") - ne)
    val delPrior = acts.filter(col("is_del") && col("pick") >= ne)
      .select(col("action_id"), priorSrc.as("src"), priorDst.as("dst"),
        col("is_del"))
    val delBase = acts.filter(col("is_del") && col("pick") < ne)
      .join(indexed, col("pick") === col("idx"))
      .select(col("action_id"), col("esrc").as("src"), col("edst").as("dst"),
        col("is_del"))
    inserts.union(delPrior).union(delBase)
      .select(col("action_id"), col("src"), col("dst"), col("is_del"))
  }
}
