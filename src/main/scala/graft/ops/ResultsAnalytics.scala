package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * parse are dropped rather than failing the scan. `dir` may be a
    * comma-separated list of directories — e.g. the reference's results
    * plus graft's own `Bench` run JSON, charting both as one series set.
    */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir.split(",").toIndexedSeq: _*)
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

  /** Metrics where a larger value is better: `update` is a RATE — the
    * reference stores edges/sec there (make_graphs.py titles it "Update
    * Rate", y-axis "Edges per Second"); everything else is time/memory
    * where smaller wins.
    */
  val higherIsBetter: Set[String] = Set("update")

  /** Run-size tier from the results-file name (the reference names runs
    * `<ts>.<engine>.<tier>`; graft's sweep writes `run.graft.<tier>`).
    * Untiered files get a null tier and are excluded from the per-tier
    * comparison: a run at an unknown size would chart as a singleton
    * section where its package trivially ranks first against nobody (they
    * still count in the tier-blind [[summary]]).
    */
  def tierOf(file: Column): Column = {
    val t = regexp_extract(file, "\\.(tiny|small|medium|large)(\\.fail)?$", 1)
    when(t === "", lit(null)).otherwise(t)
  }

  /** Chart-shaped summary: per (tier, metric), packages ranked best-first
    * (rate metrics descend, time/memory metrics ascend), with each
    * package's factor-worse-than-best (1.0 = best, always ≥ 1).
    */
  def summaryByTier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = metrics(load(spark, dir))
      .withColumn("tier", tierOf(col("file")))
      .filter(col("tier").isNotNull)
      // zero timings are "not measured" placeholders (e.g. the *-NA runs)
      .filter(col("value") > 0.0)
      .groupBy(col("tier"), col("metric"), col("package"))
      .agg(avg(col("value")).as("value"), count(lit(1)).as("n_runs"))
    val rate = col("metric").isInCollection(higherIsBetter)
    // rank key: negate rate metrics so one ascending window ranks both kinds
    val keyed = m.withColumn("__key",
      when(rate, -col("value")).otherwise(col("value")))
    val w = Window.partitionBy(col("tier"), col("metric"))
      .orderBy(col("__key").asc)
    val best = first(col("value")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    keyed.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rel_to_best",
        when(best =!= 0.0,
          round(when(rate, best / col("value"))
            .otherwise(col("value") / best), 4))
          .otherwise(lit(null)))
      .drop("__key")
  }

  /** Tier-blind summary (all runs of a package averaged per metric). */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = metrics(load(spark, dir))
      .filter(col("value") > 0.0)
      .groupBy(col("metric"), col("package"))
      .agg(avg(col("value")).as("value"), count(lit(1)).as("n_runs"))
    val rate = col("metric").isInCollection(higherIsBetter)
    val keyed = m.withColumn("__key",
      when(rate, -col("value")).otherwise(col("value")))
    val w = Window.partitionBy(col("metric")).orderBy(col("__key").asc)
    val best = first(col("value")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    keyed.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rel_to_best",
        when(best =!= 0.0,
          round(when(rate, best / col("value"))
            .otherwise(col("value") / best), 4))
          .otherwise(lit(null)))
      .drop("__key")
  }

  private val chartTitles = Map(
    "build" -> "Initial Graph Construction (s)",
    "sv" -> "Connected Components (s)",
    "pr" -> "Page Rank (s)",
    "sssp" -> "Single Source Shortest Path (s)",
    "update" -> "Update Rate (edges/s)",
    "mem" -> "Memory Usage (KB)")

  private val tierOrder = Seq("tiny", "small", "medium", "large")

  /** Self-contained HTML bar charts — the make_graphs.py output
    * re-expressed without external JS (inline SVG, log-free linear bars
    * scaled per metric). One section per (metric, tier) in the reference's
    * metric order, tiers smallest-first, so a package's scaling slope
    * reads left to right down the page.
    */
  def chartsHtml(spark: SparkSession, dir: String): String = {
    val rows = summaryByTier(spark, dir)
      .select("tier", "metric", "package", "value", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val sections = for {
      m <- metricNames :+ "mem"
      t <- tierOrder
      bars = rows.filter(r => r._2 == m && r._1 == t).sortBy(_._5)
      if bars.nonEmpty
    } yield {
      val maxV = bars.map(_._4).max
      def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
      val rects = bars.zipWithIndex.map { case ((_, _, pkg, v, _), i) =>
        val wpx = math.max(1, (560.0 * v / maxV).round)
        val label = String.format(java.util.Locale.ROOT, "%.4g", Double.box(v))
        val hl = if (pkg.startsWith("graft")) "#b0563a" else "#4472a8"
        s"""<g transform="translate(0,${i * 24})">
           |<text x="150" y="15" text-anchor="end" font-size="12">${esc(pkg)}</text>
           |<rect x="160" y="3" width="$wpx" height="16" fill="$hl"/>
           |<text x="${160 + wpx + 5}" y="15" font-size="11">$label</text>
           |</g>""".stripMargin
      }.mkString("\n")
      s"""<h2>${chartTitles.getOrElse(m, m)} — $t</h2>
         |<svg width="800" height="${bars.length * 24 + 8}">$rects</svg>""".stripMargin
    }
    s"<!DOCTYPE html><html><head><meta charset='utf-8'><title>graft results</title>" +
      s"</head><body>\n${sections.mkString("\n")}\n</body></html>"
  }

  /** Write the comparison charts next to the given path. */
  def writeCharts(spark: SparkSession, dir: String, outFile: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      chartsHtml(spark, dir))
}
