package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import javax.imageio.ImageIO

/** The real image-decode path: actual PNG/JPEG bytes through
  * `javax.imageio` inside the partition-parallel plumbing, exact
  * feature assertions, and the corrupt-payload contract (explicit
  * `format_ok = false` row, never a task failure). The q32 oracle gate
  * covers the stub plumbing; this spec covers the genuine decoder. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer registered")
    out.toByteArray
  }

  test("decodeImages: real PNG/JPEG decode, exact dimensions and luminance, corrupt payloads flagged") {
    val red = imageBytes(8, 6, 0xff0000, "png")    // luma = 0.299 * 255
    val gray = imageBytes(40, 30, 0x646464, "png") // luma = 100 exactly
    val jpegGray = imageBytes(16, 16, 0x808080, "jpg")
    val corrupt = Array[Byte](1, 2, 3, 4, 5)
    val media = Seq(
      Multimodal.Media(1L, red, "s", 0L),
      Multimodal.Media(2L, gray, "s", 0L),
      Multimodal.Media(3L, jpegGray, "s", 0L),
      Multimodal.Media(4L, corrupt, "s", 0L)).toDS()
    val got = Multimodal.decodeImages(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got(1L).format_ok && got(1L).width === 8L && got(1L).height === 6L)
    assert(math.abs(got(1L).mean_luma - 0.299 * 255) < 1e-9)
    assert(got(2L).format_ok && got(2L).width === 40L && got(2L).height === 30L)
    assert(math.abs(got(2L).mean_luma - 100.0) < 1e-9)
    // JPEG is lossy: a solid mid-gray survives to within a few levels
    assert(got(3L).format_ok && got(3L).width === 16L && got(3L).height === 16L)
    assert(math.abs(got(3L).mean_luma - 128.0) < 4.0)
    // corrupt bytes: an explicit row, zeroed features, byte length kept
    assert(!got(4L).format_ok && got(4L).width === 0L &&
      got(4L).byte_len === 5L && got(4L).mean_luma === 0.0)
  }

  test("decodeImages bounds per-image work: a large image samples the luma grid, not every pixel") {
    // 640x480 half-black/half-white vertical split: the 64-grid sample
    // strides hit both halves evenly, so the sampled mean stays ~127.5
    // — and the exact-pixel mean equals it, making the grid's fidelity
    // checkable while the work stays capped at 64x64 reads
    val img = new BufferedImage(640, 480, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 480) {
      var x = 0
      while (x < 640) { img.setRGB(x, y, if (x < 320) 0x000000 else 0xffffff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out))
    val media = Seq(Multimodal.Media(1L, out.toByteArray, "s", 0L)).toDS()
    val f = Multimodal.decodeImages(media).collect().head
    assert(f.width === 640L && f.height === 480L && f.format_ok)
    assert(math.abs(f.mean_luma - 127.5) < 1.0)
  }
}
