package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing (SURVEY §2 M1): media as opaque `binary`
  * columns + typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything Spark-side — the binary
  * column, the schema, the mapPartitions batch shape, the partition-parallel
  * execution — is real. In production `decodeStub` is replaced by a codec
  * call (e.g. JPEG decode) with the identical signature, and the plan is
  * unchanged: a scan of (id, payload) partitions streaming through a
  * per-partition iterator (no per-row setup cost, no driver collect).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, channels: Long)

  /** STUB decode: derives fake-but-deterministic image dimensions from the
    * payload length. Replace with a real codec in production (`???` shape:
    * bytes => (width, height, channels)).
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) =
    ((payload.length % 640).toLong, (payload.length % 480).toLong, 3L)

  /** Ingest documents' text as a binary payload column (stand-in for image
    * bytes) and extract metadata per partition.
    */
  def extractMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    bin.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = decodeStub(r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h, c)
      }
    }.toDF()
  }

  val extractMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels
      |FROM documents""".stripMargin

  val DefaultFrames = 4
  val DefaultFrameBytes = 64

  /** M2: frame sampling over a binary payload — N evenly-strided fixed-size
    * byte windows per blob, exploded to one row per frame with a stubbed
    * per-frame feature (md5 signature; production: replace with the real
    * frame decode + embedding, identical plumbing). The generator runs
    * inside the scan projection: no shuffle at all.
    */
  def sampleFrames(spark: SparkSession, dir: String,
      nFrames: Int = DefaultFrames,
      frameBytes: Int = DefaultFrameBytes): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"),
        greatest(expr(s"octet_length(payload) div $nFrames"), lit(1L))
          .cast("int").as("stride"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        substring(col("payload"),
          (col("frame_idx") * col("stride") + 1).cast("int"), lit(frameBytes))
          .as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("frame")).as("frame_sig"),
        octet_length(col("frame")).cast("long").as("frame_bytes"))

  /** Oracle at the string level — documents are pure ASCII so byte offsets
    * equal character offsets and md5(bytes) = md5(varchar).
    */
  val sampleFramesSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, i AS frame_idx,
       |    greatest(length(text) // $DefaultFrames, 1) AS stride, text
       |  FROM documents, unnest(range(0, $DefaultFrames)) AS t(i)
       |)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  md5(substring(text, CAST(frame_idx * stride + 1 AS BIGINT), $DefaultFrameBytes)) AS frame_sig,
       |  CAST(length(substring(text, CAST(frame_idx * stride + 1 AS BIGINT), $DefaultFrameBytes)) AS BIGINT) AS frame_bytes
       |FROM f""".stripMargin
}
