package graft.multimodal

import java.awt.image.BufferedImage

/** Shared ImageIO entry points for the multimodal lane.
  *
  * Two pure-performance disciplines, both bit-identical to the naive
  * spelling:
  *
  *  1. `ImageIO.setUseCache(false)` — ImageIO's default
  *     ImageInputStream/ImageOutputStream backing is a TEMP FILE per
  *     decode/encode. For in-memory payloads that is a filesystem
  *     round-trip per frame; at ~30k frame decodes in one
  *     q_video_neardup run it dominates the wall. Memory-backed
  *     streams decode/encode the identical bytes. Set once per JVM
  *     (object init runs on driver and every executor).
  *  2. Bulk `getRGB(0, 0, w, h, ...)` — the per-pixel `getRGB(x, y)`
  *     path pays a color-model conversion call per pixel; the bulk
  *     form converts the same pixels to the same default-sRGB ARGB
  *     ints in one pass.
  */
object ImageCodec {

  javax.imageio.ImageIO.setUseCache(false)

  /** Decode an in-memory payload; null when it does not decode (the
    * decoder-not-validator contract — callers drop nulls). */
  def decode(payload: Array[Byte]): BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: Exception => null }

  /** The image's pixels as default-sRGB ARGB ints, row-major — the
    * same values `getRGB(x, y)` yields per pixel. */
  def argb(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
}
