package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayDot, MinHashSigFn}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("array_dot matches the HOF formulation and handles nulls") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0))).toDF("a", "b")
    val got = df.select(ArrayDot.dot(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(32.0, -2.0))
    val withNull = df.limit(1).select(ArrayDot.dot(lit(null).cast("array<double>"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("GraftExtensions registers the functions for SQL users") {
    // TestSpark sets spark.sql.extensions=graft.GraftExtensions — the
    // standard production config path
    val dot = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sig = spark.sql("SELECT minhash_sig('hello world hello', 5, 16) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 16)
  }

  test("minhash_sig: identical strings share signatures, estimate tracks jaccard") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val near = base.replace("quick", "quack")
    val far = "completely different content with no shared five grams at all " * 6
    val df = Seq((0L, base), (1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
        MinHashSigFn.minhashSig(col("text"), 5, 126).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs(0L), sigs(2L)) > 0.5, "near-dup estimate too low")
    assert(est(sigs(0L), sigs(3L)) < 0.3, "unrelated estimate too high")
    // signature length and short-string handling
    val short = Seq((0L, "ab")).toDF("doc_id", "text")
      .select(MinHashSigFn.minhashSig(col("text"), 5, 126)).head().getSeq[Long](0)
    assert(short.length == 126)
  }
}
