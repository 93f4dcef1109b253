package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing (SURVEY §2 M1): media as opaque `binary`
  * columns + typed metadata, processed per-partition in batches.
  *
  * The decode step is REAL for still images AND WAV audio: `javax.imageio`
  * is JDK-standard (PNG/JPEG/GIF/BMP readers ship with the JVM — no
  * external codecs needed) and [[decodeImage]] reads true
  * width/height/channels from the bytes; [[decodeWav]] (r8) walks the
  * public RIFF chunk layout for channels/sample-rate/duration — no codec
  * needed for header meta. Payloads that are neither (e.g. the
  * text-as-bytes stand-in corpus the driver oracle runs on) fall back to
  * [[syntheticMeta]], a deterministic length-derived shape, so mixed
  * binary columns flow through one pipeline. Compressed audio/video
  * codecs are not in the JDK; those stay behind the same bytes => meta
  * signature.
  *
  * The Spark shape is the production one either way: a scan of
  * (id, payload) partitions streaming through a per-partition iterator —
  * no per-row reader setup (the magic-byte sniff gates SPI lookup), no
  * shuffle, no driver collect.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, media_type: String,
      width: Long, height: Long, channels: Long, sample_rate: Long,
      duration_ms: Long)

  /** Cheap magic-byte sniff: only payloads that can be a JDK-decodable
    * image reach ImageIO's reader lookup (a text payload costs 4 byte
    * compares, not a stream + SPI probe per row).
    */
  def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  // ImageIO's default disk cache writes a temp file per decoded stream —
  // pure filesystem churn for ByteArrayInputStream sources, which need no
  // cache at all. JVM-global, set once when this object first loads on an
  // executor (i.e. before any decode call).
  javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode via JDK ImageIO: (width, height, channels) from the
    * actual pixel raster, or None when the payload is not a decodable
    * image.
    */
  def decodeImage(payload: Array[Byte]): Option[(Long, Long, Long)] =
    if (!looksLikeImage(payload)) None
    else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      .map(img => (img.getWidth.toLong, img.getHeight.toLong,
        img.getRaster.getNumBands.toLong))

  /** Deterministic fallback shape for non-media payloads (length-derived),
    * keeping mixed binary columns total and the text-corpus oracle exact.
    */
  def syntheticMeta(payload: Array[Byte]): (Long, Long, Long) =
    ((payload.length % 640).toLong, (payload.length % 480).toLong, 3L)

  /** Cheap magic-byte sniff for WAV: RIFF container with a WAVE form type
    * (the audio analog of [[looksLikeImage]] — 8 byte compares gate the
    * chunk walk).
    */
  def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL audio container parse: the WAV/RIFF format is public and fully
    * deterministic (RIFF 1991 spec — little-endian chunk walk; no codec
    * needed for the header), so unlike compressed audio the meta decode
    * is a few dozen lines of byte arithmetic. Walks the chunk list for
    * `fmt ` (channels, sample rate, byte rate) and `data` (payload size),
    * returning (channels, sample_rate_hz, duration_ms) with duration =
    * data_bytes · 1000 / byte_rate in exact integer math. None for
    * malformed or truncated containers (they fall through to the
    * synthetic shape like any other opaque payload).
    */
  def decodeWav(p: Array[Byte]): Option[(Long, Long, Long)] = {
    if (!looksLikeWav(p)) return None
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    var channels = -1L
    var rate = -1L
    var byteRate = -1L
    var dataBytes = -1L
    // the cursor is a Long: u32 chunk sizes near Int.MaxValue must not wrap
    // the advance negative (that turned a malformed container into an
    // uncaught StringIndexOutOfBounds instead of the documented None)
    var o = 12L
    while (o + 8 <= p.length && (channels < 0 || dataBytes < 0)) {
      val oi = o.toInt // safe: o + 8 <= p.length <= Int.MaxValue
      val id = new String(p, oi, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(oi + 4)
      val remaining = p.length - o - 8
      if (id == "fmt " && size >= 16 && remaining >= 16) {
        channels = u16(oi + 8 + 2).toLong
        rate = u32(oi + 8 + 4)
        byteRate = u32(oi + 8 + 8)
      } else if (id == "data") {
        // the data chunk may legally extend to EOF; clamp to what's here
        dataBytes = math.min(size, remaining)
      } else if (size > remaining) {
        // any OTHER chunk claiming more bytes than the payload holds is a
        // malformed container -> synthetic-meta fallback, never a task death
        return None
      }
      o += 8 + size + (size & 1L) // chunks pad to even sizes; Long math
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataBytes < 0) None
    else Some((channels, rate, dataBytes * 1000L / byteRate))
  }

  /** Magic-byte sniff for AVI: the same RIFF container as WAV with an
    * `AVI ` form type.
    */
  def looksLikeAvi(p: Array[Byte]): Boolean =
    p.length >= 64 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  /** REAL video container parse for AVI (r9): the same public RIFF chunk
    * walk as [[decodeWav]] — the `avih` main header (inside the `LIST
    * hdrl` compound chunk, OpenDML/AVI 1.0 spec) carries
    * µs-per-frame (+0), total frames (+16), stream count (+24) and
    * width/height (+32/+36) as little-endian u32s. Returns (width,
    * height, streams, duration_ms) with duration = frames ·
    * µs-per-frame / 1000 in exact integer math; None for malformed or
    * truncated containers (synthetic-shape fallback, like WAV).
    */
  def decodeAvi(p: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (!looksLikeAvi(p)) return None
    def u32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def fourCc(o: Int): String =
      new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var o = 12L // Long cursor: the decodeWav overflow lesson applies here
    while (o + 12 <= p.length) {
      val oi = o.toInt
      val id = fourCc(oi)
      val size = u32(oi + 4)
      val remaining = p.length - o - 8
      if (id == "LIST" && fourCc(oi + 8) == "hdrl") {
        // walk the hdrl sub-chunks for avih (clamped to this LIST's span)
        val end = o + 8 + math.min(size, remaining)
        var s = o + 12
        while (s + 8 <= end) {
          val si = s.toInt
          val sid = fourCc(si)
          val ssize = u32(si + 4)
          if (sid == "avih" && ssize >= 40 && s + 8 + 40 <= end) {
            val usPerFrame = u32(si + 8)
            val frames = u32(si + 8 + 16)
            val streams = u32(si + 8 + 24)
            val w = u32(si + 8 + 32)
            val h = u32(si + 8 + 36)
            if (w <= 0 || h <= 0) return None
            return Some((w, h, streams, frames * usPerFrame / 1000L))
          }
          s += 8 + ssize + (ssize & 1L)
        }
        return None // hdrl without avih: malformed
      } else if (id != "LIST" && size > remaining) {
        return None // non-compound chunk claiming more bytes than present
      }
      o += 8 + size + (size & 1L)
    }
    None
  }

  /** Magic-byte sniff for MP4/ISO-BMFF: an `ftyp` box first. */
  def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 16 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  /** REAL video container parse for MP4 (r9): ISO base-media box walk
    * (ISO/IEC 14496-12, public) — boxes are (u32 BE size, 4cc type);
    * `moov/mvhd` (version 0) carries timescale (+12 after the
    * version/flags word) and duration (+16), `moov/trak/tkhd` width and
    * height as 16.16 fixed-point in its last 8 bytes. Returns (width,
    * height, tracks, duration_ms); None for malformed containers.
    */
  def decodeMp4(p: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (!looksLikeMp4(p)) return None
    def u32be(o: Int): Long = ((p(o) & 0xffL) << 24) |
      ((p(o + 1) & 0xffL) << 16) | ((p(o + 2) & 0xffL) << 8) |
      (p(o + 3) & 0xffL)
    def fourCc(o: Int): String =
      new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var durMs = -1L
    var w = 0L
    var h = 0L
    var tracks = 0L
    // walk(from, to): iterate sibling boxes, recursing into moov/trak
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      var o = from
      while (o + 8 <= to) {
        val oi = o.toInt
        val size = u32be(oi)
        val typ = fourCc(oi + 4)
        if (size < 8 || o + size > to) return false // malformed box
        if (typ == "moov" || typ == "trak") {
          if (depth < 4 && !walk(o + 8, o + size, depth + 1)) return false
        } else if (typ == "mvhd" && size >= 8 + 4 + 16) {
          if (p(oi + 8) != 0) return false // only version-0 handled
          val timescale = u32be(oi + 8 + 12)
          val duration = u32be(oi + 8 + 16)
          if (timescale <= 0) return false
          durMs = duration * 1000L / timescale
        } else if (typ == "tkhd" && size >= 92) {
          tracks += 1
          // v0 tkhd: width/height are the box's last two 16.16 words
          val tw = u32be(oi + size.toInt - 8) >> 16
          val th = u32be(oi + size.toInt - 4) >> 16
          if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
        }
        o += size
      }
      true
    }
    if (!walk(0L, p.length.toLong, 0)) None
    else if (durMs < 0) None // no mvhd: not a playable ISO-BMFF movie
    else Some((w, h, tracks, durMs))
  }

  /** Total decode to the typed meta row: real ImageIO for images, real
    * RIFF header parse for WAV audio and AVI video, real ISO-BMFF box
    * walk for MP4 video, deterministic synthetic shape for genuinely
    * opaque payloads — one pipeline for mixed binary columns.
    */
  def decodeMeta(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeImage(payload) match {
      case Some((w, h, c)) =>
        MediaMeta(docId, payload.length.toLong, "image", w, h, c, 0L, 0L)
      case None => decodeWav(payload) match {
        case Some((ch, rate, durMs)) =>
          MediaMeta(docId, payload.length.toLong, "audio", 0L, 0L, ch,
            rate, durMs)
        case None => decodeAvi(payload) match {
          case Some((w, h, streams, durMs)) =>
            MediaMeta(docId, payload.length.toLong, "video", w, h,
              streams, 0L, durMs)
          case None => decodeMp4(payload) match {
            case Some((w, h, tracks, durMs)) =>
              MediaMeta(docId, payload.length.toLong, "video", w, h,
                tracks, 0L, durMs)
            case None =>
              val (w, h, c) = syntheticMeta(payload)
              MediaMeta(docId, payload.length.toLong, "binary", w, h, c,
                0L, 0L)
          }
        }
      }
    }

  /** Extract per-payload metadata from a binary column, one streamed
    * partition at a time.
    */
  def extractMetaFrom(bin: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions(rows => rows.map(r => decodeMeta(r.doc_id, r.payload)))
      .toDF()
  }

  /** Ingest documents' text as a binary payload column (stand-in for image
    * bytes — none parse as images, so the oracle's length-derived shape is
    * exact) and extract metadata per partition.
    */
  def extractMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractMetaFrom(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow])
  }

  val extractMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  'binary' AS media_type,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(0 AS BIGINT) AS sample_rate,
      |  CAST(0 AS BIGINT) AS duration_ms
      |FROM documents""".stripMargin

  final case class MediaFeature(doc_id: Long, width: Long, height: Long,
      feature: Array[Float])

  /** Real image feature extraction: decode (ImageIO), resize to a
    * `grid`×`grid` thumbnail (Graphics2D bilinear — also JDK-standard),
    * average-pool to grayscale luminance in [0,1] — a `grid`²-float
    * embedding comparable with the cosine ops in [[Similarity]]. Non-image
    * payloads produce an empty vector (filter `size(feature) > 0`
    * downstream). Same zero-shuffle mapPartitions shape as
    * [[extractMetaFrom]].
    */
  def imageFeatures(bin: org.apache.spark.sql.Dataset[MediaRow],
      grid: Int = 4): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { rows =>
      rows.map { r =>
        val img = if (looksLikeImage(r.payload))
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload)))
        else None
        img match {
          case Some(im) =>
            val feat = grayBoxDownsample(im, grid, grid).map(_ / 255f)
            MediaFeature(r.doc_id, im.getWidth.toLong, im.getHeight.toLong,
              feat)
          case None =>
            MediaFeature(r.doc_id, 0L, 0L, Array.empty[Float])
        }
      }
    }.toDF()
  }

  final case class PHashRow(doc_id: Long, phash: Long, is_image: Boolean)

  /** Explicit box-average grayscale downsample to w×h over the decoded
    * pixel data — pure integer/double arithmetic, identical on every
    * JDK/platform (Graphics2D `drawImage` interpolation is
    * implementation-defined, so hashes built on it are only comparable
    * within one JVM). Target cell (x,y) averages the luminance of the
    * source box [x·W/w,(x+1)·W/w) × [y·H/h,(y+1)·H/h), right/bottom
    * boundaries floored per cell so every source pixel lands in exactly
    * one box (boxes are ≥1 px even when upscaling). Returns luminance in
    * [0,255], row-major.
    */
  private[ops] def grayBoxDownsample(im: java.awt.image.BufferedImage,
      w: Int, h: Int): Array[Float] = {
    val srcW = im.getWidth
    val srcH = im.getHeight
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      val y0 = (y.toLong * srcH / h).toInt
      val y1 = math.max(y0 + 1, ((y + 1).toLong * srcH / h).toInt)
      var x = 0
      while (x < w) {
        val x0 = (x.toLong * srcW / w).toInt
        val x1 = math.max(x0 + 1, ((x + 1).toLong * srcW / w).toInt)
        var sum = 0.0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val rgb = im.getRGB(xx, yy)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            xx += 1
          }
          yy += 1
        }
        out(y * w + x) = (sum / ((x1 - x0).toDouble * (y1 - y0))).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit perceptual difference-hash (dHash: resize to 9×8 grayscale,
    * bit y·8+x set iff lum(x,y) > lum(x+1,y) — Krawetz 2013): robust to
    * rescaling/recompression, the standard cheap image near-dup signal.
    * The 9×8 downsample is the explicit [[grayBoxDownsample]], so the
    * hash is a pure function of the decoded pixels, not of a
    * platform-defined Graphics2D interpolator.
    * None when the payload is not a decodable image.
    */
  def dHash64(payload: Array[Byte]): Option[Long] =
    if (!looksLikeImage(payload)) None
    else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { im =>
      val lum = grayBoxDownsample(im, 9, 8)
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (lum(y * 9 + x) > lum(y * 9 + x + 1))
            bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }

  /** Deterministic non-image fallback: the first 64 bits of md5(payload)
    * (big-endian — identical to parsing the first 16 hex digits), so the
    * mixed-column pipeline stays total AND the driver's text-payload
    * corpus is exactly reproducible in DuckDB SQL.
    */
  def fallbackHash64(payload: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    java.nio.ByteBuffer.wrap(d).getLong
  }

  /** Per-payload 64-bit perceptual fingerprints — real dHash for images,
    * md5-derived fallback otherwise; same zero-shuffle mapPartitions shape
    * as the other decode steps.
    */
  def perceptualHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          dHash64(r.payload) match {
            case Some(h) => PHashRow(r.doc_id, h, is_image = true)
            case None => PHashRow(r.doc_id, fallbackHash64(r.payload),
              is_image = false)
          }
        }
      }.toDF()
  }

  /** M3 (driver query): the per-payload fingerprint table itself —
    * (doc_id, phash, is_image) — hash-checked value-exactly against the
    * DuckDB oracle's 64-bit reconstruction, so the fingerprint arithmetic
    * (not just a row count) is gated. The PAIR pipeline over these
    * fingerprints is [[phashDupsFrom]], exercised on real images in tests
    * (the driver's text corpus has no near-dup payloads at Hamming ≤ 3 —
    * md5 fallbacks of distinct texts are uniform random, so its pair set
    * is empty by construction).
    */
  def perceptualHashQuery(spark: SparkSession, dir: String): DataFrame =
    perceptualHashes(spark, dir)
      .select(col("doc_id"), col("phash"),
        col("is_image").cast("long").as("is_image"))

  /** Oracle: rebuild the signed 64-bit fallback hash from md5 hex via two
    * 32-bit positional-digit halves in HUGEINT, wrapped to signed BIGINT
    * (the same emulation the R-MAT XXH64 oracle uses).
    */
  val perceptualHashSql: String = {
    def half(start: Int): String = (0 until 8).map { j =>
      s"(strpos('0123456789abcdef', substr(hx, ${start + j}, 1)) - 1) * ${1L << (4 * (7 - j))}"
    }.mkString("(", " + ", ")")
    s"""WITH h AS (
       |  SELECT doc_id, md5(text) AS hx FROM documents
       |), parts AS (
       |  SELECT doc_id, CAST(${half(1)} AS HUGEINT) AS hi,
       |    CAST(${half(9)} AS HUGEINT) AS lo
       |  FROM h
       |)
       |SELECT doc_id,
       |  CAST(hi * 4294967296 + lo
       |    - CASE WHEN hi >= 2147483648 THEN CAST('18446744073709551616' AS HUGEINT)
       |           ELSE 0 END AS BIGINT) AS phash,
       |  CAST(0 AS BIGINT) AS is_image
       |FROM parts""".stripMargin
  }

  /** M3 (pair pipeline): perceptual near-dup pairs at Hamming ≤ maxHamming
    * over 64-bit fingerprints, blocked with the SAME lossless
    * permuted-table machinery as SimHash text dedup (D4) — the fingerprint
    * family changes, the scale path doesn't.
    */
  def phashDupsFrom(bin: org.apache.spark.sql.Dataset[MediaRow],
      maxHamming: Int = 3, blocks: Int = 6,
      prefixBlocks: Int = 3): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    val fps = bin.mapPartitions { rows =>
      rows.map { r =>
        val h = dHash64(r.payload).getOrElse(fallbackHash64(r.payload))
        (r.doc_id, h)
      }
    }.toDF("doc_id", "simhash")
    Dedup.pairsFromBuckets(
      Dedup.permutedTables(fps, blocks, prefixBlocks), maxHamming)
  }

  /** The documents-table instantiation of the pair pipeline. */
  def phashDups(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    phashDupsFrom(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow], maxHamming)
  }

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
