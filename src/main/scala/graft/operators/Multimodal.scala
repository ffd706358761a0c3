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
  * Two decoders live here:
  *
  *  - [[decodeFeatures]] — the ORACLE-GATED stub: deterministic fake
  *    "decoded" attributes (dimensions from an MD5 of the payload,
  *    checksum, byte length) so a SQL oracle can value-check the
  *    plumbing end-to-end over the text-payload testdata.
  *  - [[decodeImages]] — a REAL image decoder on `javax.imageio`
  *    (in the JDK, no added dependency): PNG/JPEG/GIF/BMP payloads
  *    decode to width/height/mean-luminance features. Undecodable
  *    payloads yield an explicit `format_ok = false` row instead of
  *    throwing — a crawl-scale corpus always contains corrupt bytes,
  *    and one bad payload must not kill a 1000-executor job. Audio /
  *    video codecs remain out of scope for this container; their
  *    plumbing shape is the same `mapPartitions` contract.
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

  /** Real decoded-image features. `mean_luma` is Rec. 601 luminance
    * averaged over a bounded sample grid; `format_ok = false` marks a
    * payload no registered reader could decode (corrupt or non-image),
    * with zeroed features. */
  final case class ImageFeatures(doc_id: Long, source: String, byte_len: Long,
      width: Long, height: Long, mean_luma: Double, format_ok: Boolean)

  /** REAL image decode over opaque binary payloads —
    * `javax.imageio.ImageIO` per partition, streamed rows, no driver
    * involvement. Feature extraction stays O(1) per image regardless
    * of resolution: luminance is averaged over at most
    * `lumaGrid`×`lumaGrid` sample points (a 100-megapixel outlier
    * costs the same as a thumbnail — per-item cost bounds are what
    * keep a 100 TB decode stage's stragglers in check). Corrupt or
    * non-image payloads return `format_ok = false` rather than
    * failing the task. */
  def decodeImages(media: Dataset[Media], lumaGrid: Int = 64): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // ImageIO's plugin registry scan happens once per JVM on first
      // use — this touch keeps it out of the first row's latency.
      // setUseCache(false): the default wraps every read in a
      // disk-backed FileCacheImageInputStream (a temp file per row!)
      // even though the payload is already fully in memory.
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.getReaderFormatNames()
      rows.map { m =>
        val img =
          // NonFatal, not just IOException: plugin readers throw
          // RuntimeExceptions (CMMException, IllegalArgumentException,
          // ArrayIndexOutOfBounds...) on crafted/truncated payloads,
          // and those must also land in the format_ok=false row
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case Some(i) =>
            val w = i.getWidth; val h = i.getHeight
            val sx = math.max(1, w / lumaGrid); val sy = math.max(1, h / lumaGrid)
            var sum = 0.0; var n = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = i.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                n += 1
                x += sx
              }
              y += sy
            }
            ImageFeatures(m.doc_id, m.source, m.payload.length.toLong,
              w.toLong, h.toLong, if (n == 0) 0.0 else sum / n, format_ok = true)
          case None =>
            ImageFeatures(m.doc_id, m.source, m.payload.length.toLong,
              0L, 0L, 0.0, format_ok = false)
        }
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
