package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Per-query A/B receipt harness for the r14 optimization round: runs each
  * named query at `SPARK_GRAFT_SF_DIR` (default sf0.1) on a FRESH session
  * per query and reports wall seconds plus the Spark JOB count — the
  * round-trip metric the job-fusion changes attack (for the iterative
  * queries the final plan is a checkpoint scan, so job count is the
  * honest per-round plan receipt; `explain` shows one LogicalRDD).
  *
  * Usage: runMain graft.tools.QueryJobAb [--explain OUTDIR] <query ...>
  */
object QueryJobAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (explainDir, queries) = args.toSeq match {
      case "--explain" +: dir +: rest => (Some(dir), rest)
      case rest => (None, rest)
    }
    val spark0 = graft.Bench.sparkAt(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new AtomicInteger(0)
    spark0.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.incrementAndGet(): Unit
    })
    // untimed warmup (the Bench contract: workloads, not JVM startup);
    // NonFatal only (ADVICE r14): a fatal OOM/linkage error here must
    // surface, not silently poison every measurement after it
    try graft.SparkEntry.queries("q1_agg")(spark0, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => }
    queries.foreach { name =>
      val spark = spark0.newSession() // cold session memos per query
      Thread.sleep(300) // let listener-bus drain the previous query's jobs
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val nJobs = jobs.get() - j0
      System.err.println(f"[qab] $name%-28s $sec%8.2f s  jobs=$nJobs%-5d rows=$n")
      explainDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark0.stop()
  }
}
