package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads travel as opaque `binary` columns next to typed metadata,
  * and per-item decode/feature-extraction runs batch-wise inside
  * `mapPartitions` — the shape a real image/audio decoder plugs into
  * (per-partition init of the expensive decoder object, streamed rows,
  * no driver involvement, scales by adding partitions).
  *
  * The decode itself is a STUB by design: no media libraries exist in
  * this environment, so [[decodeFeatures]] derives deterministic fake
  * "decoded" attributes (dimensions from an MD5 of the payload,
  * checksum, byte length). Everything around it — schema, encoders,
  * partition batching, the per-partition heavyweight-init pattern — is
  * real and tested, and a genuine decoder drops in by replacing the
  * body of `decodeOne`.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class Media(doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)

  /** Stub-decoded features. `fake_w`/`fake_h` stand in for decoded
    * dimensions; `checksum` is a content fingerprint; `n_frames` is
    * what a fixed-stride frame sampler would emit for a video of
    * `byte_len` bytes. */
  final case class MediaFeatures(doc_id: Long, source: String, byte_len: Long,
      fake_w: Long, fake_h: Long, checksum: String, n_frames: Long)

  /** Lift the documents table into media rows, payload = UTF-8 text
    * bytes (the container has no binary corpora; schema and plumbing
    * are identical for real media). */
  def toMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("n_chars"))
      .as[Media]
  }

  /** Batch decode: one MessageDigest per partition (the "expensive
    * decoder init" slot), then a streamed pass over the partition's
    * rows. Deterministic: dimensions are mod-buckets of the payload's
    * 60-bit MD5 prefix, mirroring [[graft.functions.TextFunctions.md5Long]]
    * so a SQL oracle can verify the plumbing end-to-end. */
  def decodeFeatures(media: Dataset[Media], frameStride: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition init
      rows.map { m =>
        md.reset()
        val hex = md.digest(m.payload).map("%02x".format(_)).mkString
        val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        MediaFeatures(
          doc_id = m.doc_id,
          source = m.source,
          byte_len = m.payload.length.toLong,
          fake_w = 1L + hv % 1920L,
          fake_h = 1L + hv % 1080L,
          checksum = hex.substring(0, 16),
          n_frames = (m.payload.length.toLong + frameStride - 1) / frameStride)
      }
    }
  }

  /** Fixed-stride frame sampler stub: emits every `stride`-th byte as
    * a "frame" (id, offset, value). Real frame extraction replaces the
    * byte slice with a decoded frame tensor; the explode shape —
    * one row per sampled frame, partition-parallel — is the real
    * contract. */
  def sampleFrames(media: Dataset[Media], stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.indices.by(stride).map { off =>
        (m.doc_id, off.toLong, (m.payload(off) & 0xff).toLong)
      }
    }.toDF("doc_id", "frame_offset", "frame_value")
  }
}
