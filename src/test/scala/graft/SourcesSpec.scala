package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{EdgeUpdates, RMat}
import graft.sources.StingerFiles

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfTiny

  test("stinger csr graph round-trips through the binary format") {
    val g = RMat.graph(spark, RMat.Params(scale = 8))
    val path = Files.createTempDirectory("graft-csr").resolve("g.bin").toString
    StingerFiles.writeGraph(g.edges, path)
    val back = StingerFiles.readGraph(spark, path, partitions = 3).edges
    assert(back.count() == g.edges.count())
    assert(g.edges.exceptAll(back).count() == 0)
    assert(back.exceptAll(g.edges).count() == 0)
  }

  test("stinger actions round-trip with ~x delete encoding") {
    val actions = EdgeUpdates.actionsFromEvents(spark, sf).limit(500)
    val path = Files.createTempDirectory("graft-act").resolve("a.bin").toString
    StingerFiles.writeActions(actions, path)
    val back = StingerFiles.readActions(spark, path, partitions = 3)
    assert(back.count() == actions.count())
    val cols = Seq("action_id", "src", "dst", "is_del").map(col)
    assert(actions.select(cols: _*).exceptAll(back.select(cols: _*)).count() == 0)
    assert(back.filter(col("src") < 0 || col("dst") < 0).count() == 0)
  }
}
