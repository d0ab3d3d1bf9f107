package graft.multimodal

/** Deterministic tiny-image generation through the JDK's own ImageIO
  * encoders — the fixture side of q_image_meta. Dimension/format
  * functions are pure arithmetic on the id so the DuckDB oracle can
  * state the expected parse results without seeing any bytes. */
object ImageFixture {
  private val Formats = Vector("png", "jpeg", "gif")

  def formatOf(id: Long): String = Formats((((id % 3) + 3) % 3).toInt)
  def widthOf(id: Long): Int = ((id % 61) + 4).toInt
  def heightOf(id: Long): Int = ((id % 43) + 4).toInt

  /** Encode a w×h image with id-derived flat color via ImageIO.
    * Headless-safe: BufferedImage needs no display. */
  def encode(format: String, w: Int, h: Int, id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (id * 2654435761L & 0xffffffL).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    val ok = javax.imageio.ImageIO.write(img, format, out)
    require(ok, s"no ImageIO writer for $format")
    out.toByteArray
  }
}
