package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hub key
    val big = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(777L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((777L, "hub"), (0L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
