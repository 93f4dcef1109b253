package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeUpdates
import graft.ops.Relational
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfTiny

  test("streaming hourly agg equals the batch aggregation") {
    val stream = EventStream.eventsHourly(spark, sf)
      .select("hour", "event_type", "n", "sum_value")
    val batch = Relational.eventsHourly(spark, sf)
      .select("hour", "event_type", "n", "sum_value")
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }

  test("micro-batched graph maintenance equals one-shot batch update") {
    val folded = EventStream.maintainGraph(spark, sf, batches = 3)
    val oneShot = EdgeUpdates.updatedGraph(spark, sf).edges
    assert(folded.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(folded).count() == 0)
  }

  test("foreachBatch streaming graph maintenance equals one-shot batch update") {
    val streamed = EventStream.maintainGraphStream(spark, sf, batches = 3)
    val oneShot = EdgeUpdates.updatedGraph(spark, sf).edges
    assert(streamed.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(streamed).count() == 0)
  }
}
