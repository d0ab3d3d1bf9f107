package graft.multimodal

/** Perceptual image hashing for media near-dup (round-7 verdict gap:
  * the pipeline decoded pixels and the dedup lane had Hamming banding,
  * but nothing composed them — image dedup was exact-bytes only, while
  * at corpus scale RE-ENCODED duplicates are the common case).
  *
  * The hash is an 8×8 AVERAGE hash (aHash) over box-averaged
  * luminance: bit i is set iff cell i's average luminance exceeds the
  * mean of all 64 cells. aHash is chosen over dHash deliberately:
  * dHash compares ADJACENT cells, so two cells of equal color are a
  * tie whose comparison bit is decided by codec noise — a JPEG
  * re-encode of a flat-region image flips roughly half its tie bits
  * and lands far outside any usable Hamming threshold. aHash compares
  * every cell against the global mean, so for two-level content the
  * margin is ~half the dynamic range and codec noise (a few luminance
  * levels) cannot flip a bit.
  *
  * Everything is deterministic arithmetic over the decoded pixels —
  * integer box sums, one IEEE division per cell — so the same payload
  * hashes identically on every JVM/executor. */
object ImagePhash {

  /** 64-bit average-hash of an encoded image payload; None when the
    * payload does not decode (the decoder-not-validator contract —
    * corrupt rows drop out of the dedup candidate space instead of
    * poisoning it). */
  def aHash64(payload: Array[Byte]): Option[Long] = {
    val img = ImageCodec.decode(payload)
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    // one bulk ARGB conversion (same default-sRGB ints as per-pixel
    // getRGB, without the per-call color-model conversion)
    val px = ImageCodec.argb(img)
    // integer box-average luminance per cell: cell (r,c) covers pixel
    // rows [r·h/8, (r+1)·h/8) × cols [c·w/8, (c+1)·w/8), clamped to at
    // least one pixel so images narrower than 8px stay total
    val avg = new Array[Double](64)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8
      val y1 = math.max(y0 + 1, math.min(h, (r + 1) * h / 8))
      var c = 0
      while (c < 8) {
        val x0 = c * w / 8
        val x1 = math.max(x0 + 1, math.min(w, (c + 1) * w / 8))
        var sum = 0L
        var y = y0
        while (y < y1) {
          val row = y * w
          var x = x0
          while (x < x1) {
            val rgb = px(row + x)
            // integer Rec.601 luma — deterministic, no float rounding
            sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        avg(r * 8 + c) = sum.toDouble / ((y1 - y0).toLong * (x1 - x0))
        c += 1
      }
      r += 1
    }
    val mean = avg.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (avg(i) > mean) bits |= 1L << i
      i += 1
    }
    Some(bits)
  }

  /** Hamming distance between two hashes — spec/oracle helper. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
