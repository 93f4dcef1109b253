package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Receipt for the two BPE apply paths (r13 verdict item #1's done-bar):
  * the codegen'd literal replace CHAIN ([[Bpe.tokenCount]]) vs the
  * broadcast-merge-table mapPartitions KERNEL
  * ([[Bpe.tokenCountsKernel]]) across growing merge-table sizes.
  *
  * The claim under test is the scaling contract each path's scaladoc
  * states: the chain's cost (and its expression tree) grows WITH the
  * table — every merge is a replace scan whether or not it fires — while
  * the kernel's per-word work is O(symbols × merges-APPLIED), so padding
  * the table with inert entries (pairs over symbols that never occur)
  * must leave its runtime flat. Tables beyond the pinned 64 are the real
  * table plus inert padding — the apply RESULT is identical at every
  * size (asserted here row-for-row), only the table size changes, which
  * is exactly the variable a production 10k-50k-merge vocabulary turns.
  *
  * Prints one JSON line and writes it to `results/bpe_ab.json`.
  */
object BpeAb {
  /** Inert padding: '#' never occurs in the corpus, so '#i' symbols are
    * never built and the padded pairs can never fire.
    */
  def pad(merges: Seq[(String, String)], n: Int): Seq[(String, String)] =
    merges ++ (merges.size until n).map(i => (s"#$i", s"#$i"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.sparkAt(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.core.Tables.documents(spark, sfDir)
      .localCheckpoint(true) // pin the input: scans stay out of the timing
    val nDocs = docs.count()

    def chainDf(m: Seq[(String, String)]): DataFrame =
      docs.select(col("doc_id"),
        aggregate(transform(
          filter(split(col("text"), " "), t => t =!= ""),
          w => Bpe.tokenCount(w, m)), lit(0L), (a, x) => a + x)
          .as("n_tokens"))

    def kernelDf(m: Seq[(String, String)]): DataFrame =
      Bpe.tokenCountsKernel(docs, m).select(col("doc_id"), col("n_tokens"))

    // steady-state per the bench policy: two trials, min
    def time(f: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.count()
        (System.nanoTime() - t0) / 1e9
      }.min

    def tokSum(df: DataFrame): Long =
      df.agg(sum(col("n_tokens"))).head().getLong(0)

    val base = Bpe.PinnedMergesFull
    val sizes = Seq(64, 256, 1024, 10240)
    val out = new StringBuilder
    out ++= s"""{"sf":"$sfDir","n_docs":$nDocs"""

    // equality first: chain-64 ≡ kernel-64 row-for-row (and both against
    // the 24-merge chain/kernel pair)
    for ((m, tag) <- Seq((Bpe.PinnedMerges, 24), (base, 64))) {
      val c = chainDf(m); val k = kernelDf(m)
      val diff = c.except(k).count() + k.except(c).count()
      System.err.println(s"[bpe-ab] chain-vs-kernel diff @$tag merges: $diff")
      out ++= s""","diff_$tag":$diff"""
      require(diff == 0, s"chain and kernel disagree at $tag merges")
    }
    val refSum = tokSum(kernelDf(base))

    for (n <- sizes) {
      val m = pad(base, n)
      val kSec = time(kernelDf(m))
      val kSum = tokSum(kernelDf(m))
      require(kSum == refSum, s"padded kernel changed the result at $n")
      // the chain at ≥10k merges is the documented failure mode: a
      // 10k-deep expression tree breaks analysis/codegen — record the
      // failure instead of crashing the receipt
      val cSec = try time(chainDf(m)) catch {
        case e: Throwable =>
          System.err.println(s"[bpe-ab] chain @$n merges FAILED: " +
            e.getClass.getSimpleName)
          -1.0
      }
      System.err.println(f"[bpe-ab] table=$n%-6d kernel $kSec%6.2f s   " +
        f"chain ${cSec}%6.2f s")
      out ++= f""","kernel_$n":$kSec%.3f,"chain_$n":$cSec%.3f"""
    }
    out ++= "}"
    println(out.result())
    val p = java.nio.file.Paths.get("results/bpe_ab.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, out.result() + "\n")
    spark.stop()
  }
}
