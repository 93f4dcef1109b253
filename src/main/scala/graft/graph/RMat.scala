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

  /** (src, dst) edge table with nv*edgeFactor rows. */
  def edges(spark: SparkSession, p: Params): DataFrame = {
    val ne = (1L << p.scale) * p.edgeFactor
    // uniform double in [0,1) from a 64-bit hash of (seed, edge, level)
    def u(level: Int): Column =
      (pmod(xxhash64(lit(p.seed), col("id"), lit(level)), lit(1L << 40)).cast("double")
        / lit((1L << 40).toDouble))
    val zero = (lit(0L), lit(0L))
    val (srcCol, dstCol) = (0 until p.scale).foldLeft(zero) { case ((s, t), k) =>
      val r = u(k)
      // quadrant: A=(0,0) B=(0,1) C=(1,0) D=(1,1) with P = a,b,c,d
      val srcBit = when(r >= p.a + p.b, 1L).otherwise(0L)
      val dstBit = when((r >= p.a && r < p.a + p.b) || r >= p.a + p.b + p.c, 1L)
        .otherwise(0L)
      (s + (srcBit * (1L << k)), t + (dstBit * (1L << k)))
    }
    spark.range(ne).select(srcCol.as("src"), dstCol.as("dst"))
  }

  /** Weighted graph: multiplicities collapsed, like the CSR the reference
    * writes (duplicate R-MAT edges accumulate weight).
    */
  def graph(spark: SparkSession, p: Params): Graph =
    Graph(edges(spark, p).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight")))
}
