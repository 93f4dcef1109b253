package graft.sources

import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * The write path assembles CSR on the driver and is meant for
  * interoperability fixtures, not scale (the scale path is parquet).
  */
object StingerFiles {
  val EndianCheck = 0x1234ABCDL
  private val HeaderBytes = 24L // endian_check, nv, ne

  private def openBuffer(path: String, pos: Long, nBytes: Int,
      flip: Boolean): ByteBuffer = {
    val fs = FileSystem.get(new URI(path), new Configuration())
    val in = fs.open(new Path(path))
    try {
      in.seek(pos)
      val arr = new Array[Byte](nBytes)
      in.readFully(arr)
      val buf = ByteBuffer.wrap(arr)
      buf.order(if (flip) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      buf
    } finally in.close()
  }

  /** Read the 3-word header; returns (nv, ne, flipEndian). */
  private def header(path: String): (Long, Long, Boolean) = {
    val buf = openBuffer(path, 0L, 24, flip = false)
    val check = buf.getLong()
    val flip = check != EndianCheck
    if (flip) {
      val b2 = openBuffer(path, 0L, 24, flip = true)
      require(b2.getLong() == EndianCheck, s"bad magic in $path")
      (b2.getLong(), b2.getLong(), true)
    } else (buf.getLong(), buf.getLong(), false)
  }

  /** Distributed CSR read → edge DataFrame (src, dst, weight). */
  def readGraph(spark: SparkSession, path: String,
      partitions: Int = 0): Graph = {
    val (nv, _, flip) = header(path)
    val p = if (partitions > 0) partitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (nv / 65536L + 1L).toInt))
    import spark.implicits._
    val edges = spark.range(0L, nv, 1L, p).as[Long].mapPartitions { it =>
      val vs = it.toArray
      if (vs.isEmpty) Iterator.empty
      else {
        val v0 = vs.head
        val v1 = vs.last + 1 // spark.range partitions are contiguous
        // off[v0..v1] — v1-v0+1 words
        val offBuf = openBuffer(path, HeaderBytes + 8L * v0,
          (8L * (v1 - v0 + 1)).toInt, flip)
        val off = Array.fill((v1 - v0 + 1).toInt)(offBuf.getLong())
        val (e0, e1) = (off.head, off.last)
        val nvTotal = nv
        val indPos = HeaderBytes + 8L * (nvTotal + 1)
        // re-read ne from the header inside the task to locate wgt[]
        val ne = openBuffer(path, 16L, 8, flip).getLong()
        val wgtPos = indPos + 8L * ne
        val indBuf = openBuffer(path, indPos + 8L * e0, (8L * (e1 - e0)).toInt, flip)
        val wgtBuf = openBuffer(path, wgtPos + 8L * e0, (8L * (e1 - e0)).toInt, flip)
        val ind = Array.fill((e1 - e0).toInt)(indBuf.getLong())
        val wgt = Array.fill((e1 - e0).toInt)(wgtBuf.getLong())
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
    val (na, _, flip) = {
      val buf = openBuffer(path, 0L, 16, flip = false)
      val check = buf.getLong()
      val f = check != EndianCheck
      val b = if (f) openBuffer(path, 0L, 16, flip = true) else { buf.rewind(); buf }
      require(b.getLong() == EndianCheck, s"bad magic in $path")
      (b.getLong(), 0L, f)
    }
    val p = if (partitions > 0) partitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (na / 1000000L + 1L).toInt))
    import spark.implicits._
    spark.range(0L, na, 1L, p).as[Long].mapPartitions { it =>
      val ids = it.toArray
      if (ids.isEmpty) Iterator.empty
      else {
        val a0 = ids.head
        val buf = openBuffer(path, 16L + 16L * a0, (16L * ids.length).toInt, flip)
        ids.iterator.map { id =>
          val i = buf.getLong(); val j = buf.getLong()
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
    val fs = FileSystem.get(new URI(path), new Configuration())
    val out = fs.create(new Path(path), true)
    try out.write(buf.array()) finally out.close()
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
    val fs = FileSystem.get(new URI(path), new Configuration())
    val out = fs.create(new Path(path), true)
    try out.write(buf.array()) finally out.close()
  }
}
