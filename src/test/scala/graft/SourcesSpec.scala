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

  test("stinger csr write: id gaps, boundary vertices, many partitions") {
    import spark.implicits._
    // srcs with long id gaps (off fill inside partitions), a hub whose
    // run must cross range-partition boundaries at 8 partitions, and a
    // sink-only vertex past every src (off tail fill on the driver)
    val hub = (0L until 64L).map(d => (100L, 200L + d, 1L))
    val rows = Seq((0L, 5L, 1L), (7L, 3L, 2L), (300L, 301L, 1L)) ++ hub
    val edges = rows.toDF("src", "dst", "weight")
    val path = Files.createTempDirectory("graft-csr").resolve("g.bin").toString
    StingerFiles.writeGraph(edges, path, partitions = 8)
    val back = StingerFiles.readGraph(spark, path, partitions = 5).edges
    assert(back.count() == edges.count())
    assert(edges.exceptAll(back).count() == 0)
    assert(back.exceptAll(edges).count() == 0)
    // and an empty graph writes a readable header-only file
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight")
    val p2 = Files.createTempDirectory("graft-csr").resolve("e.bin").toString
    StingerFiles.writeGraph(empty, p2, partitions = 2)
    assert(StingerFiles.readGraph(spark, p2).edges.count() == 0)
  }

  test("csv action feed: arrival-order physmap, defaults, replay") {
    import graft.sources.ActionFeeds
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv")
    // named vertices; "bob" first appears on line 0 (as dst), "eve" on
    // line 2; weight field present, no time field
    Files.write(dir.resolve("edges.csv"),
      "alice,bob,3\nbob,carol,1\neve,alice,2\ncarol,bob,5\n".getBytes)
    val a = ActionFeeds.csvActions(spark, dir.toString, srcField = 0,
      dstField = 1, weightField = 2).orderBy("action_id").collect()
    assert(a.length == 4)
    // physmap: alice=0, bob=1 (line 0), carol=2 (line 1), eve=3 (line 2)
    val byAction = a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(byAction(0) == ((0L, 0L, 1L, 3L, 0L, false)))
    assert(byAction(1) == ((1L, 1L, 2L, 1L, 0L, false)))
    assert(byAction(2) == ((2L, 3L, 0L, 2L, 0L, false)))
    assert(byAction(3) == ((3L, 2L, 1L, 5L, 0L, false)))
    // the feed replays through the same merge the binary feed uses
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight")
    val applied = EdgeUpdates(empty,
      ActionFeeds.csvActions(spark, dir.toString, weightField = 2))
    assert(applied.count() == 4)
    // same-line tie with src_name > dst_name: the reference maps the
    // source field first (csv_stream.c), so "zed" must id BEFORE "ann"
    val dir2 = Files.createTempDirectory("graft-csv2")
    Files.write(dir2.resolve("edges.csv"), "zed,ann\nann,bob\n".getBytes)
    val b = ActionFeeds.csvActions(spark, dir2.toString)
      .orderBy("action_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b(0) == ((0L, 0L, 1L)), s"zed=0 ann=1 expected, got ${b(0)}")
    assert(b(1) == ((1L, 1L, 2L)), s"ann=1 bob=2 expected, got ${b(1)}")
  }

  test("random action feed: deterministic, bounded, insert-only batches") {
    import graft.sources.ActionFeeds
    val a = ActionFeeds.randomActions(spark, nv = 100, n = 5000,
      edgesPerBatch = 1000)
    val b = ActionFeeds.randomActions(spark, nv = 100, n = 5000,
      edgesPerBatch = 1000)
    assert(a.exceptAll(b).count() == 0, "feed is not deterministic")
    assert(a.filter(col("src") < 0 || col("src") >= 100 ||
      col("dst") < 0 || col("dst") >= 100).count() == 0)
    assert(a.filter(col("is_del")).count() == 0, "reference feed is insert-only")
    // time = batch + 1 (random_stream.c:58)
    val times = a.select(col("time")).distinct().collect()
      .map(_.getLong(0)).sorted
    assert(times.sameElements(1L to 5L), s"got ${times.toSeq}")
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

  test("rmatter parity end-to-end: generate, file round-trip, replay, cc") {
    // the reference workflow (rmatter writes g.bin + a.bin, engines read
    // them, apply the actions, and analyze): generate an R-MAT graph and
    // action stream, round-trip both through the binary format, replay the
    // actions on the file-read graph, and check connected components match
    // the all-in-memory pipeline
    val p = RMat.Params(scale = 7)
    val g = RMat.graph(spark, p)
    val actions = RMat.actions(spark, p, na = 2000L, pDelete = 0.2)
    val dir = Files.createTempDirectory("graft-e2e")
    val gPath = dir.resolve("g.bin").toString
    val aPath = dir.resolve("a.bin").toString
    StingerFiles.writeGraph(g.edges, gPath)
    StingerFiles.writeActions(actions, aPath)
    val gBack = StingerFiles.readGraph(spark, gPath, partitions = 3)
    val aBack = StingerFiles.readActions(spark, aPath, partitions = 3)
    val fromFiles = EdgeUpdates(gBack.edges, aBack)
    val inMemory = EdgeUpdates(g.edges, actions)
    assert(fromFiles.exceptAll(inMemory).count() == 0 &&
      inMemory.exceptAll(fromFiles).count() == 0,
      "file-replayed update disagrees with in-memory update")
    val ccFiles = graft.graph.ConnectedComponents(graft.graph.Graph(fromFiles))
    val ccMem = graft.graph.ConnectedComponents(graft.graph.Graph(inMemory))
    assert(ccFiles.exceptAll(ccMem).count() == 0 &&
      ccMem.exceptAll(ccFiles).count() == 0)
  }
}
