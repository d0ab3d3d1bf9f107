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

  /** SplitMix64 finalizer — the deterministic per-cell coin for
    * [[encodePattern]] (public constant-multiplier mix, reproducible
    * anywhere). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Encode a 64×64 two-level block pattern derived from `group` —
    * the near-dup fixture: every format encodes the SAME pixel
    * content for a given group, so re-encodings of one group must
    * perceptual-hash together while distinct groups (independent
    * 64-bit patterns, expected Hamming distance 32) must not. Blocks
    * are 8×8 px, aligned with both the aHash cells and the JPEG DCT
    * grid, black/white by the sign of a SplitMix64 mix of
    * (group, cell) — margins of ±½ dynamic range that codec noise
    * cannot flip. */
  def encodePattern(format: String, group: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cell = 0
    while (cell < 64) {
      val white = mix64(group * 64 + cell) < 0
      val rgb = if (white) 0xffffff else 0x000000
      val cx = (cell % 8) * 8
      val cy = (cell / 8) * 8
      var y = cy
      while (y < cy + 8) {
        var x = cx
        while (x < cx + 8) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      cell += 1
    }
    // memory-backed ImageIO stream (see ImageCodec: the default is a
    // temp FILE per encode)
    ImageCodec.encode(img, format)
      .getOrElse(throw new IllegalArgumentException(s"no ImageIO writer for $format"))
  }

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
    ImageCodec.encode(img, format)
      .getOrElse(throw new IllegalArgumentException(s"no ImageIO writer for $format"))
  }
}
