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
}
