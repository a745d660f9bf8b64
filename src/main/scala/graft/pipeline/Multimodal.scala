package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata riding
  * alongside; [[HeaderDecoder]] does a REAL container-header decode —
  * format sniffed from magic bytes, pixel dimensions / sample rate /
  * duration parsed from the PNG/GIF/BMP/JPEG/WAV headers — with no
  * image/audio libraries (full-frame pixel decode would need a codec;
  * swap in JavaCV/TwelveMonkeys/ffmpeg-per-partition behind the same
  * [[MediaDecoder]] seam for that). Everything is production-shaped:
  *
  *  - decode/feature-extract runs via `mapPartitions` so a heavier decoder
  *    can amortize per-partition init (model load, native context) exactly
  *    like a Pandas-UDF batch would;
  *  - rows are repartitioned by id so media of one asset lands together;
  *  - output is a flat, columnar feature schema (no opaque blobs downstream).
  */
object Multimodal {

  /** A media row: payload + minimal typed metadata. */
  final case class MediaRow(
      id: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      mimeType: String)

  /** Extracted features — fixed columnar schema for downstream joins. */
  final case class MediaFeatures(
      id: Long,
      modality: String,
      format: String, // sniffed container: png/jpeg/gif/bmp/wav/unknown
      byteLength: Long,
      checksum: Long, // FNV-1a content digest
      width: Int,     // images: pixel dims from the header; else 0
      height: Int,
      durationMs: Long, // audio: from byte rate × data size; else 0
      frameCount: Int)  // video/frame-sampled; else 1

  /** Decoder contract: turn an opaque payload into columnar features. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Container-header decoder: sniffs the format from magic bytes and
    * parses the real header fields — PNG IHDR (big-endian dims), GIF
    * logical screen (little-endian), BMP info header (little-endian),
    * JPEG SOF marker scan, WAV RIFF/fmt/data (duration from byte rate).
    * Unrecognized payloads come back as `unknown` with zero dims — never
    * a throw, a poisoned asset must not kill the batch. */
  object HeaderDecoder extends MediaDecoder {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
    private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => u8(b, i + j) == s.charAt(j))

    /** (format, width, height, durationMs) from container headers. */
    private[graft] def sniff(b: Array[Byte]): (String, Int, Int, Long) = {
      val n = b.length
      if (n >= 24 && u8(b, 0) == 0x89 && ascii(b, 1, "PNG") &&
          u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
          u8(b, 7) == 0x0a && ascii(b, 12, "IHDR"))
        ("png", be32(b, 16), be32(b, 20), 0L)
      else if (n >= 10 && (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")))
        ("gif", le16(b, 6), le16(b, 8), 0L)
      else if (n >= 26 && ascii(b, 0, "BM"))
        ("bmp", le32(b, 18), math.abs(le32(b, 22)), 0L)
      else if (n >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
        // JPEG: walk marker segments to the first SOF (C0-CF minus the
        // non-frame C4/C8/CC): height at +5 (BE16), width at +7.
        var i = 2
        var out: Option[(Int, Int)] = None
        while (out.isEmpty && i + 3 < n && u8(b, i) == 0xff) {
          val marker = u8(b, i + 1)
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 8 < n) out = Some((be16(b, i + 7), be16(b, i + 5)))
            else i = n
          } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
            i += 2 // standalone markers carry no length
          } else if (i + 3 < n) {
            i += 2 + be16(b, i + 2)
          } else i = n
        }
        out match {
          case Some((w, h)) => ("jpeg", w, h, 0L)
          case None         => ("jpeg", 0, 0, 0L)
        }
      } else if (n >= 44 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
        // Walk RIFF chunks: byte rate from `fmt `, payload size from
        // `data`; duration = dataSize * 1000 / byteRate.
        // Cursor and chunk size stay Long: a hostile 32-bit size near
        // 2^32 would wrap an Int cursor negative (AIOOBE) or step zero
        // (infinite loop). Bail on any non-advancing or out-of-range
        // chunk — a poisoned asset must not kill the batch.
        var i = 12L
        var byteRate = 0L
        var dataSize = -1L
        var chunks = 0
        var bad = false
        while (!bad && i + 8 <= n && (byteRate == 0L || dataSize < 0L)) {
          val ii = i.toInt
          val sz = le32(b, ii + 4).toLong & 0xffffffffL
          if (ascii(b, ii, "fmt ") && i + 16 + 8 <= n)
            byteRate = le32(b, ii + 16).toLong & 0xffffffffL
          if (ascii(b, ii, "data")) dataSize = sz
          val next = i + 8L + sz + (sz & 1L) // chunks are word-aligned
          chunks += 1
          if (next <= i || next > n.toLong || chunks > 1024) bad = true
          else i = next
        }
        val dur =
          if (byteRate > 0L && dataSize >= 0L) dataSize * 1000L / byteRate
          else 0L
        ("wav", 0, 0, dur)
      } else ("unknown", 0, 0, 0L)
    }

    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val checksum = bytes.foldLeft(1469598103934665603L)((h, b) =>
        (h ^ (b & 0xffL)) * 1099511628211L) // FNV-1a
      val (format, w, h, dur) = sniff(bytes)
      MediaFeatures(row.id, row.modality, format, bytes.length.toLong,
        checksum, w, h, dur, frameCount = 1)
    }
  }

  /** Minimal container ENCODERS mirroring [[HeaderDecoder]]: wrap an
    * opaque payload in a valid header (round-trip pinning, fixture
    * synthesis, oracle-checked decode queries). */
  object Containers {
    private def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def s(x: String): Array[Byte] =
      x.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    /** PNG signature + IHDR (big-endian dims); 29 header bytes. */
    def png(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      Array(0x89.toByte) ++ s("PNG") ++
        Array(0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte) ++
        be32(13) ++ s("IHDR") ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ payload

    /** BMP file + DIB header (little-endian dims); 26 header bytes. */
    def bmp(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      s("BM") ++ le32(26 + payload.length) ++ le32(0) ++ le32(26) ++
        le32(40) ++ le32(w) ++ le32(h) ++ payload

    /** GIF89a logical screen (little-endian dims); 10 header bytes. */
    def gif(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      s("GIF89a") ++ le16(w) ++ le16(h) ++ payload

    /** WAV RIFF/fmt/data (PCM mono, 8-bit, sampleRate == byteRate);
      * 44 header bytes, duration = payload.length / byteRate seconds. */
    def wav(byteRate: Int, payload: Array[Byte]): Array[Byte] =
      s("RIFF") ++ le32(36 + payload.length) ++ s("WAVE") ++
        s("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(byteRate) ++
        le32(byteRate) ++ le16(1) ++ le16(8) ++
        s("data") ++ le32(payload.length) ++ payload

    /** JPEG SOI + APP0 stub + SOF0 frame header (big-endian dims). */
    def jpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, 0xd8.toByte) ++
        Array(0xff.toByte, 0xe0.toByte) ++ Array[Byte](0, 16) ++
        s("JFIF") ++ Array.fill[Byte](10)(0) ++
        Array(0xff.toByte, 0xc0.toByte) ++ Array[Byte](0, 17, 8) ++
        Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
          ((w >> 8) & 0xff).toByte, (w & 0xff).toByte) ++
        Array.fill[Byte](10)(3) ++ payload
  }

  /** Decode + feature-extract. Repartitions by id (co-locates an asset's
    * rows), then `mapPartitions` so a heavier decoder initializes once per
    * partition — the Scala analog of a Pandas-UDF batch. */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = HeaderDecoder,
      partitions: Option[Int] = None): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val parted = partitions
      .map(p => media.repartition(p, col("id")))
      .getOrElse(media.repartition(col("id")))
    parted.mapPartitions { rows =>
      // Per-partition init happens here (decoder context, model load, ...).
      rows.map(decoder.decode)
    }
  }

  /** Frame sampling for video payloads: emit every `stride`-th fixed-size
    * chunk as a (stubbed) frame — the plumbing (explode shape, ordering
    * column) matches what a real frame extractor produces. */
  final case class Frame(id: Long, frameIdx: Int, frameBytes: Array[Byte])

  def sampleFrames(
      media: Dataset[MediaRow], stride: Int, frameSize: Int = 1024): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { row =>
      row.content.grouped(frameSize).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => Frame(row.id, idx, chunk)
      }
    }
  }

  /** Wrap arbitrary source rows (id, bytes) into media rows. */
  def fromBinary(df: DataFrame, idCol: String, bytesCol: String,
      modality: String, mimeType: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => MediaRow(id, modality, bytes, mimeType) }
  }
}
