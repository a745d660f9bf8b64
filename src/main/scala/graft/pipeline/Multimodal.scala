package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata riding
  * alongside — the Spark-side schema, partitioning and batch iteration are
  * real and tested; the actual codec calls are STUBBED behind
  * [[MediaDecoder]] (no image/audio libraries in this container). Swap in a
  * real decoder (JavaCV, TwelveMonkeys, ffmpeg-cli per partition, ...) by
  * replacing `StubDecoder` — everything else is production-shaped:
  *
  *  - decode/feature-extract runs via `mapPartitions` so a real decoder can
  *    amortize per-partition init (model load, native context) exactly like
  *    a Pandas-UDF batch would;
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
      byteLength: Long,
      checksum: Long, // decoder-dependent content digest
      width: Int,     // images/video: pixel dims; audio: 0
      height: Int,
      durationMs: Long, // audio/video; images: 0
      frameCount: Int)  // video/frame-sampled; else 1

  /** Decoder contract. Real implementations decode `content`; the stub
    * derives deterministic fake values from the bytes so the pipeline is
    * fully testable without codecs. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB: deterministic fake decode (no codec libraries available here).
    * Field derivations are arbitrary but stable functions of the payload. */
  object StubDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val checksum = bytes.foldLeft(1469598103934665603L)((h, b) =>
        (h ^ (b & 0xffL)) * 1099511628211L) // FNV-1a
      val n = bytes.length
      row.modality match {
        case "image" =>
          MediaFeatures(row.id, row.modality, n, checksum,
            width = 1 + math.abs(checksum % 4096).toInt,
            height = 1 + math.abs((checksum >> 12) % 4096).toInt,
            durationMs = 0L, frameCount = 1)
        case "audio" =>
          MediaFeatures(row.id, row.modality, n, checksum,
            width = 0, height = 0,
            durationMs = n / 16L, frameCount = 1)
        case "video" =>
          MediaFeatures(row.id, row.modality, n, checksum,
            width = 1 + math.abs(checksum % 1920).toInt,
            height = 1 + math.abs((checksum >> 12) % 1080).toInt,
            durationMs = n / 4L,
            frameCount = 1 + (n / 1024))
        case other => sys.error(s"unknown modality $other")
      }
    }
  }

  /** Decode + feature-extract. Repartitions by id (co-locates an asset's
    * rows), then `mapPartitions` so a real decoder initializes once per
    * partition — the Scala analog of a Pandas-UDF batch. */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder,
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
