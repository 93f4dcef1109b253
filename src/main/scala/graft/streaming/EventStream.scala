package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.graph.{EdgeUpdates, Graph}

/** Structured Streaming operators (SURVEY §2 X1–X2).
  *
  * X1 runs the hourly event aggregation as a real streaming query (file
  * source → groupBy agg → memory sink, complete mode) driven to completion
  * with AvailableNow — same code that would run with a Kafka source and a
  * Delta sink on a cluster. Distinct aggregations are not supported in
  * streaming, so the streaming variant drops n_users vs the batch op.
  *
  * X2 maintains a graph under a stream of edge actions with foreachBatch:
  * each micro-batch applies EdgeUpdates set-algebra to the accumulated edge
  * state — the streaming re-expression of the reference's sequential update
  * loop (ref: tests/networkx/test_python.py:139-144).
  */
object EventStream {
  private val nameCounter = new AtomicLong(0)

  /** X1: windowed aggregation over events as a stream, returned as a batch
    * DataFrame once the AvailableNow run completes.
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    // raw (unnormalized) schema: the file carries ts as long nanos under
    // spark.sql.legacy.parquet.nanosAsLong; normalize after readStream.
    val schema = Tables.load(spark, dir, "events").schema
    // the streaming file source wants a directory: stream the sf dir with a
    // glob filter selecting just events.parquet
    val stream = Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
    val agg = stream
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("hour"), col("event_type"), col("n"),
        round(col("sv"), 4).as("sum_value"))
    val name = s"graft_stream_hourly_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  val eventsHourlySql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, event_type,
      |  count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** X2: micro-batched graph maintenance. Splits the action log into
    * `batches` chunks by action_id and folds EdgeUpdates over them,
    * verifying the fold equals the one-shot batch apply (associativity of
    * last-action-wins under ordered chunks). Exercised from tests; the
    * foreachBatch production shape is identical with a streaming source.
    */
  def maintainGraph(spark: SparkSession, dir: String, batches: Int = 4): DataFrame = {
    val actions = EdgeUpdates.actionsFromEvents(spark, dir)
    val maxId = actions.agg(max(col("action_id"))).head().getLong(0)
    val step = (maxId + batches) / batches
    (0 until batches).foldLeft(Graph.fromTpch(spark, dir).edges) { (edges, i) =>
      val lo = i * step
      val hi = (i + 1) * step
      val chunk = actions.filter(col("action_id") >= lo && col("action_id") < hi)
      EdgeUpdates(edges, chunk).localCheckpoint(true)
    }
  }

  /** X2 as a REAL streaming query: the action log is staged as one file
    * per arriving batch, consumed by a file-source stream one file per
    * micro-batch (AvailableNow), and foreachBatch folds EdgeUpdates over
    * the edge state — the exact production shape for a Kafka/file feed of
    * edge mutations maintaining a graph snapshot.
    */
  def maintainGraphStream(spark: SparkSession, dir: String,
      batches: Int = 4): DataFrame = {
    val actions = EdgeUpdates.actionsFromEvents(spark, dir)
    val maxId = actions.agg(max(col("action_id"))).head().getLong(0)
    val step = (maxId + batches) / batches
    val staging = java.nio.file.Files.createTempDirectory("graft-actions-")
    (0 until batches).foreach { i =>
      actions.filter(col("action_id") >= i * step && col("action_id") < (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(staging.toString)
    }
    var state = Graph.fromTpch(spark, dir).edges.localCheckpoint(true)
    val stream = spark.readStream.schema(actions.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging.toString)
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = EdgeUpdates(state, batch).localCheckpoint(true)
      }
      .start()
    q.awaitTermination()
    state
  }
}
