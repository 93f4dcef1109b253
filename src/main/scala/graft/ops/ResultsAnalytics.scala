package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's results pipeline re-expressed on DataFrames
  * (ref: make_graphs.py:6-56 — per-run JSON files aggregated into
  * build/sv/pr/sssp/update/mem comparison charts).
  *
  * A results file is a `"sysconfig" : {...}` fragment followed by the run's
  * JSON object (ref: the results directory), so files are read whole (one
  * row per file,
  * ordinary distributed text scan), the prologue is stripped with a regexp,
  * and the object is parsed with from_json against an explicit schema —
  * no driver-side parsing, works unchanged on a directory of millions of
  * run files.
  */
object ResultsAnalytics {

  private val metricNames = Seq("build", "sv", "pr", "sssp", "update")

  val runSchema: StructType = StructType(Seq(
    StructField("mem", LongType),
    StructField("na", LongType),
    StructField("ne", LongType),
    StructField("nv", LongType),
    StructField("type", StringType),
    StructField("results", StructType(metricNames.map(m =>
      StructField(m, StructType(Seq(
        StructField("name", StringType),
        StructField("time", DoubleType)))))))))

  /** One row per parseable run file: (file, mem, na, ne, nv, type,
    * results.struct). The results directory also holds crashed-run stubs
    * (sysconfig prologue only), READMEs, and `RSLT: `-line-prefixed dumps —
    * the prefix is stripped to salvage those, and rows that still don't
    * parse are dropped rather than failing the scan.
    */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"),
        from_json(
          // strip RSLT: line prefixes, then drop everything before the
          // first '{' that starts a line (the sysconfig fragment)
          regexp_replace(
            regexp_replace(col("value"), "(?m)^RSLT: ", ""),
            "(?s)^.*?(\\n|^)\\{", "{"),
          runSchema).as("run"))
      .select(col("file"), col("run.*"))
      .filter(col("nv").isNotNull)

  /** Long-form metrics: (file, package, metric, value) — the shape every
    * chart in make_graphs.py derives from, plus mem keyed by `type`.
    */
  def metrics(runs: DataFrame): DataFrame = {
    val timed = metricNames.map { m =>
      runs.select(col("file"),
        col(s"results.$m.name").as("package"),
        lit(m).as("metric"),
        col(s"results.$m.time").as("value"))
    }.reduce(_ unionAll _)
    val mem = runs.select(col("file"), col("type").as("package"),
      lit("mem").as("metric"), col("mem").cast("double").as("value"))
    timed.unionAll(mem).filter(col("package").isNotNull)
  }

  /** Chart-shaped summary: per metric, packages ranked ascending (the
    * reference sorts each bar chart by value), with each package's slowdown
    * relative to the metric's best performer.
    */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = metrics(load(spark, dir))
      // zero timings are "not measured" placeholders (e.g. the *-NA runs)
      .filter(col("value") > 0.0)
      .groupBy(col("metric"), col("package"))
      .agg(avg(col("value")).as("value"), count(lit(1)).as("n_runs"))
    val w = Window.partitionBy(col("metric")).orderBy(col("value").asc)
    val best = first(col("value")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rel_to_best",
        when(best =!= 0.0, round(col("value") / best, 4)).otherwise(lit(null)))
  }
}
