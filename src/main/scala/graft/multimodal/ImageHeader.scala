package graft.multimodal

/** Pure-JVM image-container header parsing (round-6 verdict item 4):
  * PNG IHDR, GIF Logical Screen Descriptor, JPEG SOFn — byte slicing
  * only, no codec dependency, so the decode step of the multimodal
  * pipeline produces REAL dimensions for image payloads even in a
  * container with no imaging libraries. (Pixel decoding stays out of
  * scope — headers are what a training-data curation pipeline gates
  * on: resolution filters, aspect-ratio buckets, format routing.)
  *
  * Formats, per their public specifications:
  *   - PNG (RFC 2083 / W3C): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
  *     first chunk must be IHDR → width/height as big-endian u32 at
  *     offsets 16/20.
  *   - GIF (GIF87a/GIF89a): 6-byte version signature, then the LSD's
  *     width/height as little-endian u16 at offsets 6/8.
  *   - JPEG (ITU T.81): `FF D8` SOI, then a marker-segment walk —
  *     skip fill bytes and parameterless markers, stop at SOS/EOI —
  *     until a frame header SOFn (C0–CF minus C4/C8/CC): height/width
  *     as big-endian u16 at payload offsets 3/5. The walk is what
  *     makes this robust to real encoder output (APP0/JFIF, APPn EXIF,
  *     quantization and Huffman tables all precede the SOF).
  *
  * Anything unparseable (truncated, corrupt, not an image) → None —
  * callers decide whether that is a filter drop or stub fallback.
  */
object ImageHeader {

  /** Sniffed container metadata. */
  case class ImageMeta(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 24) return None
    if (!PngSig.indices.forall(i => u8(b, i) == PngSig(i))) return None
    // first chunk must be IHDR (spec); its type tag sits at offset 12
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageMeta("png", w.toInt, h.toInt))
  }

  def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta("gif", w, h))
  }

  def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // lost segment sync — corrupt
      val marker = u8(b, i + 1)
      if (marker == 0xff) {
        i += 1 // fill byte, stay on the following 0xFF
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // TEM / RSTn carry no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any frame header
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w <= 0 || h <= 0) None else Some(ImageMeta("jpeg", w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Sniff the container by magic and parse its dimensions. */
  def parse(b: Array[Byte]): Option[ImageMeta] =
    if (b == null) None
    else parsePng(b).orElse(parseGif(b)).orElse(parseJpeg(b))
}
