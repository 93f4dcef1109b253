package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Graph

/** Reader/writer for the reference's binary graph and action-stream files
  * (ref: rmatter/src/rmatter.c:321-326 graph = u64 endian_check 0x1234ABCD,
  * nv, ne, off[nv+1], ind[ne], wgt[ne]; rmatter.c:379-381 actions =
  * endian_check, na, then na (i,j) int64 pairs, negative ~x means delete).
  *
  * The read path is distributed: vertex ranges are assigned to tasks and
  * each task seeks to its slice of the offset/adjacency arrays — the same
  * split-and-seek shape Spark uses for any splittable format, so a
  * 100 TB CSR file fans out across executors without driver involvement.
  * Executor tasks reconstruct the session's Hadoop configuration (not a
  * blank `new Configuration()` — credentials and fs.* settings must reach
  * the tasks) and read their slice in bounded chunks, so a slice larger
  * than 2 GiB of bytes does not overflow a buffer size. The write path
  * assembles CSR on the driver and is meant for interoperability fixtures,
  * not scale (the scale path is parquet).
  */
object StingerFiles {
  val EndianCheck = 0x1234ABCDL
  private val HeaderWords = 3L // endian_check, nv, ne
  private val ChunkWords = 1 << 23 // 64 MiB read chunks

  /** Effective Hadoop conf entries of the session, as a serializable,
    * task-shippable form.
    */
  private def confEntries(spark: SparkSession): Array[(String, String)] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray

  private def rebuild(entries: Array[(String, String)]): Configuration = {
    val conf = new Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Read `count` u64 words starting at byte `pos`, in bounded chunks (a
    * partition slice may exceed a single buffer's 2^31-byte limit). The
    * per-partition word count itself must fit one array — partitioning
    * keeps slices far below 2^31 edges.
    */
  private def readLongsAt(conf: Configuration, path: String, pos: Long,
      count: Long, flip: Boolean): Array[Long] = {
    require(count >= 0 && count < Int.MaxValue,
      s"partition slice of $count words exceeds one in-memory array — " +
        "raise the partition count")
    val out = new Array[Long](count.toInt)
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      in.seek(pos)
      val bytes = new Array[Byte](math.min(count.toInt, ChunkWords) * 8)
      var done = 0
      while (done < count.toInt) {
        val n = math.min(ChunkWords, count.toInt - done)
        in.readFully(bytes, 0, n * 8)
        val buf = ByteBuffer.wrap(bytes, 0, n * 8)
        buf.order(if (flip) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { out(done + i) = buf.getLong(); i += 1 }
        done += n
      }
    } finally in.close()
    out
  }

  /** Read the 3-word header; returns (nv, ne, flipEndian). */
  private def header(conf: Configuration, path: String): (Long, Long, Boolean) = {
    val h = readLongsAt(conf, path, 0L, HeaderWords, flip = false)
    if (h(0) == EndianCheck) (h(1), h(2), false)
    else {
      val f = readLongsAt(conf, path, 0L, HeaderWords, flip = true)
      require(f(0) == EndianCheck, s"bad magic in $path")
      (f(1), f(2), true)
    }
  }

  /** Distributed CSR read → edge DataFrame (src, dst, weight). */
  def readGraph(spark: SparkSession, path: String,
      partitions: Int = 0): Graph = {
    val entries = confEntries(spark)
    val (nv, _, flip) = header(rebuild(entries), path)
    val p = if (partitions > 0) partitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (nv / 65536L + 1L).toInt))
    import spark.implicits._
    val edges = spark.range(0L, nv, 1L, p).as[Long].mapPartitions { it =>
      val vs = it.toArray
      if (vs.isEmpty) Iterator.empty
      else {
        val conf = rebuild(entries)
        val v0 = vs.head
        val v1 = vs.last + 1 // spark.range partitions are contiguous
        val headerBytes = HeaderWords * 8L
        // off[v0..v1] — v1-v0+1 words
        val off = readLongsAt(conf, path, headerBytes + 8L * v0,
          v1 - v0 + 1, flip)
        val (e0, e1) = (off.head, off.last)
        val indPos = headerBytes + 8L * (nv + 1)
        // re-read ne from the header inside the task to locate wgt[]
        val ne = readLongsAt(conf, path, 16L, 1, flip)(0)
        val wgtPos = indPos + 8L * ne
        val ind = readLongsAt(conf, path, indPos + 8L * e0, e1 - e0, flip)
        val wgt = readLongsAt(conf, path, wgtPos + 8L * e0, e1 - e0, flip)
        vs.iterator.flatMap { v =>
          val i = (v - v0).toInt
          (off(i) until off(i + 1)).iterator.map { k =>
            (v, ind((k - e0).toInt), wgt((k - e0).toInt))
          }
        }
      }
    }.toDF("src", "dst", "weight")
    Graph(edges)
  }

  /** Distributed actions read → (action_id, src, dst, is_del), decoded to
    * non-negative vertex ids with the reference's ~x delete convention.
    */
  def readActions(spark: SparkSession, path: String,
      partitions: Int = 0): DataFrame = {
    val entries = confEntries(spark)
    val na = {
      val h = readLongsAt(rebuild(entries), path, 0L, 2, flip = false)
      if (h(0) == EndianCheck) h(1)
      else {
        val f = readLongsAt(rebuild(entries), path, 0L, 2, flip = true)
        require(f(0) == EndianCheck, s"bad magic in $path")
        f(1)
      }
    }
    val flip = {
      val h = readLongsAt(rebuild(entries), path, 0L, 1, flip = false)
      h(0) != EndianCheck
    }
    val p = if (partitions > 0) partitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (na / 1000000L + 1L).toInt))
    import spark.implicits._
    spark.range(0L, na, 1L, p).as[Long].mapPartitions { it =>
      val ids = it.toArray
      if (ids.isEmpty) Iterator.empty
      else {
        val conf = rebuild(entries)
        val a0 = ids.head
        val words = readLongsAt(conf, path, 16L + 16L * a0,
          2L * ids.length, flip)
        ids.iterator.zipWithIndex.map { case (id, x) =>
          val i = words(2 * x); val j = words(2 * x + 1)
          val del = i < 0
          (id, if (del) ~i else i, if (del) ~j else j, del)
        }
      }
    }.toDF("action_id", "src", "dst", "is_del")
  }

  /** Driver-side CSR write (fixture-scale). Symmetry is the caller's
    * choice — writes exactly the rows given.
    */
  def writeGraph(edges: DataFrame, path: String): Unit = {
    val rows = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("weight").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val nv = if (rows.isEmpty) 0L
      else math.max(rows.map(_._1).max, rows.map(_._2).max) + 1
    val ne = rows.length.toLong
    val buf = ByteBuffer.allocate((24L + 8L * (nv + 1) + 16L * ne).toInt)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(EndianCheck).putLong(nv).putLong(ne)
    val deg = new Array[Long](nv.toInt + 1)
    rows.foreach { case (s, _, _) => deg(s.toInt + 1) += 1 }
    var acc = 0L
    (0 to nv.toInt).foreach { i => acc += deg(i); buf.putLong(acc); deg(i) = acc }
    rows.foreach { case (_, d, _) => buf.putLong(d) }
    rows.foreach { case (_, _, w) => buf.putLong(w) }
    writeBytes(edges.sparkSession, path, buf.array())
  }

  /** Driver-side actions write (fixture-scale), encoding deletes as ~x. */
  def writeActions(actions: DataFrame, path: String): Unit = {
    val rows = actions
      .select(col("action_id").cast("long"), col("src").cast("long"),
        col("dst").cast("long"), col("is_del"))
      .collect()
      .sortBy(_.getLong(0))
    val buf = ByteBuffer.allocate(16 + 16 * rows.length)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(EndianCheck).putLong(rows.length.toLong)
    rows.foreach { r =>
      val del = r.getBoolean(3)
      buf.putLong(if (del) ~r.getLong(1) else r.getLong(1))
      buf.putLong(if (del) ~r.getLong(2) else r.getLong(2))
    }
    writeBytes(actions.sparkSession, path, buf.array())
  }

  /** Driver-side byte write through the session's Hadoop configuration. */
  private def writeBytes(spark: SparkSession, path: String,
      bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    try out.write(bytes) finally out.close()
  }
}
