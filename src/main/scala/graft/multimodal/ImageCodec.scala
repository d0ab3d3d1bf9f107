package graft.multimodal

import java.awt.image.BufferedImage

/** Shared ImageIO entry points for the multimodal lane.
  *
  * Two pure-performance disciplines, both bit-identical to the naive
  * spelling:
  *
  *  1. Memory-backed ImageIO streams — ImageIO's default
  *     ImageInputStream/ImageOutputStream backing is a TEMP FILE per
  *     decode/encode. For in-memory payloads that is a filesystem
  *     round-trip per frame; at ~30k frame decodes in one
  *     q_video_neardup run it dominates the wall. Scoped per call via
  *     an explicit MemoryCache stream (NOT `ImageIO.setUseCache
  *     (false)`, which is JVM-global mutable state that would change
  *     behavior for every other ImageIO caller in the same
  *     driver/executor JVM and trade disk for heap on their very
  *     large images too — ADVICE r9).
  *  2. Bulk `getRGB(0, 0, w, h, ...)` — the per-pixel `getRGB(x, y)`
  *     path pays a color-model conversion call per pixel; the bulk
  *     form converts the same pixels to the same default-sRGB ARGB
  *     ints in one pass.
  */
object ImageCodec {

  /** Decode an in-memory payload; null when it does not decode (the
    * decoder-not-validator contract — callers drop nulls). */
  def decode(payload: Array[Byte]): BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try javax.imageio.ImageIO.read(in) // closes `in` itself on completion
    catch { case _: Exception => null }
    finally {
      // double-close throws "closed" on ImageInputStreamImpl — only
      // close here for the paths where read() bailed before closing
      try in.close() catch { case _: java.io.IOException => () }
    }
  }

  /** Encode through a memory-backed output stream; None when no
    * ImageIO writer claims `format`. Same bytes as
    * `ImageIO.write(img, format, OutputStream)`. */
  def encode(img: java.awt.image.RenderedImage, format: String): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val ok =
      try javax.imageio.ImageIO.write(img, format, ios)
      finally ios.close() // flushes the cache into `out`
    if (ok) Some(out.toByteArray) else None
  }

  /** The image's pixels as default-sRGB ARGB ints, row-major — the
    * same values `getRGB(x, y)` yields per pixel. */
  def argb(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
}
