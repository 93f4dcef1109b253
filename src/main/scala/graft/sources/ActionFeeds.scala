package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edge-action feeds beyond the binary format — parity with the
  * reference's pluggable stream sources (ref:
  * tests/stinger/src/stream/csv_stream.c, random_stream.c; the binary
  * feed is [[StingerFiles.readActions]]). Both produce the
  * (action_id, src, dst, is_del) frame the maintain-then-analyze
  * pipeline consumes ([[graft.graph.EdgeUpdates]], X2's replay), plus
  * the reference's weight/time columns.
  */
object ActionFeeds {
  /** CSV edge feed with NAMED vertices (csv_stream.c: each line's
    * configured fields name the endpoints; stinger_mapping_create
    * assigns dense vertex ids in ARRIVAL order; missing weight/time
    * fields default to 1/0; every action is an insert — the reference's
    * csv batch loop only ever calls incr_edge_pair).
    *
    * Spark-first shape: the CSV read is the splittable distributed scan;
    * line order (→ action_id, and the arrival-order id mapping) comes
    * from one zipWithIndex pass — deterministic for a fixed file set.
    * The physmap analog assigns ids by (first-seen action, name): a
    * |V|-bounded distributed sort, built once, then joined back twice
    * (broadcast when it fits — Catalyst/AQE decides).
    *
    * @param srcField/dstField/weightField/timeField 0-based CSV column
    *   positions; -1 for weight/time means the reference's defaults.
    */
  def csvActions(spark: SparkSession, path: String,
      srcField: Int = 0, dstField: Int = 1,
      weightField: Int = -1, timeField: Int = -1,
      sep: String = ","): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("delimiter", sep).csv(path)
    val lines = raw.rdd.zipWithIndex.map { case (r, i) =>
      (i, r.toSeq.map(v => if (v == null) "" else v.toString))
    }.toDF("action_id", "f")
      .select(col("action_id"),
        element_at(col("f"), srcField + 1).as("src_name"),
        element_at(col("f"), dstField + 1).as("dst_name"),
        (if (weightField >= 0)
          element_at(col("f"), weightField + 1).cast("long")
         else lit(1L)).as("weight"),
        (if (timeField >= 0)
          element_at(col("f"), timeField + 1).cast("long")
         else lit(0L)).as("time"))
      .localCheckpoint(true)
    // physmap: dense ids by first-seen (action, endpoint role) — arrival
    // order; ties on the same line break src-before-dst, matching the
    // reference's stinger_mapping_create call order (csv_stream.c maps
    // the source field before the destination field on each line, so a
    // line introducing two new names ids the src first).
    val names = lines.select(col("src_name").as("name"), col("action_id"),
        lit(0).as("role"))
      .union(lines.select(col("dst_name").as("name"), col("action_id"),
        lit(1).as("role")))
      .groupBy(col("name"))
      .agg(min(struct(col("action_id"), col("role"))).as("first_seen"))
    val ids = names
      .orderBy(col("first_seen.action_id"), col("first_seen.role"),
        col("name"))
      .select(col("name")).rdd.map(_.getString(0)).zipWithIndex
      .toDF("name", "vid")
    lines
      .join(ids.select(col("name").as("src_name"), col("vid").as("src")),
        Seq("src_name"))
      .join(ids.select(col("name").as("dst_name"), col("vid").as("dst")),
        Seq("dst_name"))
      .select(col("action_id"), col("src"), col("dst"), col("weight"),
        col("time"), lit(false).as("is_del"))
  }

  /** Uniform random edge-action feed (random_stream.c: every action an
    * insert of (rand % nv, rand % nv), weight 1, time = batch + 1),
    * made deterministic for oracle checking like
    * [[graft.graph.RMat.actions]]: the reference's thread-racy
    * `rand()` is replaced by per-action xxhash64 draws, so any task
    * decomposition produces the identical stream.
    */
  def randomActions(spark: SparkSession, nv: Long, n: Long,
      edgesPerBatch: Long = 1000L, seed: Long = 42L): DataFrame = {
    require(nv > 0 && n >= 0 && edgesPerBatch > 0)
    spark.range(0L, n, 1L,
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          (n / 100000L + 1L).toInt)))
      .select(col("id").as("action_id"),
        pmod(xxhash64(lit(seed), lit("src"), col("id")), lit(nv)).as("src"),
        pmod(xxhash64(lit(seed), lit("dst"), col("id")), lit(nv)).as("dst"),
        lit(1L).as("weight"),
        (col("id") / lit(edgesPerBatch) + 1L).cast("long").as("time"),
        lit(false).as("is_del"))
  }
}
