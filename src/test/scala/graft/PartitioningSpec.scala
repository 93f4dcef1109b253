package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Partitioning

class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cachedSized repartitions only when badly off, preserves rows") {
    import spark.implicits._
    // 40 partitions of 25 rows each: 1000 rows at 500/partition target → 2
    val df = spark.range(0, 1000, 1, 40).toDF("id")
    val sized = Partitioning.cachedSized(df, rowsPerPartition = 500)
    assert(sized.count() == 1000)
    assert(sized.rdd.getNumPartitions <= 8, "tiny-task layout not collapsed")
    sized.unpersist()
    // already-reasonable layout is left alone (2 partitions, target 2)
    val ok = spark.range(0, 1000, 1, 2).toDF("id")
    val kept = Partitioning.cachedSized(ok, rowsPerPartition = 500)
    assert(kept.rdd.getNumPartitions == 2)
    assert(kept.count() == 1000)
    kept.unpersist()
  }
}
