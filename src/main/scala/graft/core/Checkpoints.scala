package graft.core

import org.apache.spark.sql.DataFrame

/** Eager cleanup for superseded per-round localCheckpoints.
  *
  * Iterative algorithms drop one eager `localCheckpoint` per round; each
  * holds its predecessor's row count in block-manager storage. The blocks
  * are only reclaimed when the DRIVER garbage-collects the RDD object and
  * `ContextCleaner` processes the weak reference — on a 64 GB heap the
  * driver may not run a full GC for the whole workload, so dead rounds
  * accumulate (measured at the SCALE-24 tier: ~600 MB/round × 35 PageRank
  * rounds ≈ 20 GB of dead state; steady 13 s iterations spiking to
  * 39–52 s under the storage churn). Spark's own knob for this —
  * `spark.cleaner.periodicGC.interval` — forces `System.gc()` full-GC
  * pauses that cost more than they free (sv 185 s with a 60 s interval vs
  * 91 s without, measured).
  *
  * The targeted fix: when a loop REASSIGNS its state variable, the old
  * checkpoint is provably never read again — drop its blocks immediately.
  * This must only ever be called on a DataFrame whose every future reader
  * has already materialized (an eagerly-checkpointed successor): a
  * localCheckpoint cannot be recomputed once its blocks are gone.
  */
object Checkpoints {
  /** Rebuild `df` (typically an eager localCheckpoint) as a fresh
    * DataFrame with DEFAULT size stats. The checkpoint-produced
    * `LogicalRDD` INHERITS the pre-checkpoint plan's sizeInBytes
    * estimate, so a loop whose round joins two descendants of the same
    * state table SQUARES that estimate every round (S → S²): the BigInt
    * digit count doubles per round and Catalyst's stats walk goes
    * exponential. Measured on S7's beam loop: 0.35 s/round flat until
    * ~hop 17, then ×2.5/round to 113 s by hop 23 with the driver pinned
    * in BigInteger.divide under SizeInBytesOnlyStatsPlanVisitor — same
    * data sizes every round. (One-state-product loops like PageRank only
    * MULTIPLY by a constant per round — linear digit growth — which is
    * why they never hit this.) The identity rebuild costs one
    * InternalRow↔Row conversion per read over the still-cached checkpoint
    * blocks — noise for loop-state tables.
    */
  def freshStats(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Unpersist the RDD behind an eager localCheckpoint (a `LogicalRDD`
    * plan). Non-blocking; silently a no-op for any other plan shape or on
    * reflection failure (cleanup is an optimization, never a correctness
    * dependency — the fallback is the GC-driven ContextCleaner path).
    */
  def drop(df: DataFrame): Unit = {
    try {
      val plan = df.queryExecution.logical
      if (plan.getClass.getSimpleName == "LogicalRDD") {
        val m = plan.getClass.getMethod("rdd")
        m.setAccessible(true)
        m.invoke(plan) match {
          case r: org.apache.spark.rdd.RDD[_] => r.unpersist(blocking = false)
          case _ => ()
        }
      }
    } catch { case _: Throwable => () }
  }
}
