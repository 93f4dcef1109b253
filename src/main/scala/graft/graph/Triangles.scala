package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Triangle counting (SURVEY §2 G12, extension beyond the reference's four
  * workloads): edge-parallel triple-join over canonical (u < v) edges —
  * the standard distributed formulation; each join shuffles on one endpoint
  * and AQE handles hub skew.
  */
object Triangles {

  /** Count triangles in a canonical (u < v) undirected edge table. */
  def count(canonicalEdges: DataFrame): DataFrame = {
    val e = canonicalEdges.select(col("u"), col("v")).distinct()
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .groupBy().agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
  }

  /** Nation co-region graph: nations are adjacent iff they share a region —
    * five 5-cliques at any SF, so 5 * C(5,3) = 50 triangles.
    */
  def nationEdges(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    n.as("a").join(n.as("b"),
      col("a.n_regionkey") === col("b.n_regionkey") &&
        col("a.n_nationkey") < col("b.n_nationkey"))
      .select(col("a.n_nationkey").cast("long").as("u"),
        col("b.n_nationkey").cast("long").as("v"))
  }

  val nationTrianglesSql: String =
    """WITH ne AS (
      |  SELECT DISTINCT a.n_nationkey::BIGINT AS u, b.n_nationkey::BIGINT AS v
      |  FROM nation a JOIN nation b
      |    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |)
      |SELECT count(*) AS n_triangles
      |FROM ne e1
      |JOIN ne e2 ON e1.v = e2.u
      |JOIN ne e3 ON e1.u = e3.u AND e2.v = e3.v""".stripMargin
}
