package graft.multimodal

/** Pure-JVM audio-container header parsing — the audio leg of the
  * multimodal decode step, mirroring [[ImageHeader]]: byte slicing
  * only, no codec dependency, so audio payloads yield REAL container
  * metadata (channels, sample rate, bit depth, frame count, duration)
  * even in a container with no sound libraries. Sample decoding stays
  * out of scope — headers are what a curation pipeline gates on:
  * duration filters, sample-rate buckets, mono/stereo routing.
  *
  * Formats, per their public specifications:
  *   - WAV (RIFF, Microsoft/IBM): `RIFF` + u32le size + `WAVE`, then a
  *     chunk walk — each chunk is a 4-byte tag + u32le payload size,
  *     padded to even — reading `fmt ` (wFormatTag, nChannels u16le,
  *     nSamplesPerSec u32le, wBitsPerSample u16le at payload offset 14)
  *     and `data` (frame count = payload size / block align).
  *   - AIFF (Apple, EA IFF 85): `FORM` + u32be size + `AIFF`, chunk walk
  *     with u32be sizes and even padding to `COMM`: numChannels u16be,
  *     numSampleFrames u32be, sampleSize u16be, then the sample rate as
  *     an 80-bit IEEE 754 extended float (1 sign + 15 exponent bits,
  *     64-bit mantissa with an explicit integer bit).
  *   - AU (Sun/NeXT `.snd`): u32be magic 0x2E736E64, then u32be fields
  *     dataOffset, dataSize, encoding, sampleRate, channels. Bit depth
  *     and frame size follow from the encoding code (1=μ-law 8, 2=PCM 8,
  *     3=PCM 16, 4=PCM 24, 5=PCM 32, 6/7=float).
  *
  * Anything unparseable (truncated, corrupt, not audio) → None —
  * callers decide whether that is a filter drop or stub fallback.
  */
object AudioHeader {

  /** Sniffed container metadata. `duration_ms` is floor(frames·1000 /
    * rate) — integer arithmetic so the oracle can state it exactly. */
  case class AudioMeta(format: String, channels: Int, sample_rate: Int,
      bits_per_sample: Int, n_frames: Long, duration_ms: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")

  private def durationMs(frames: Long, rate: Int): Long =
    if (rate <= 0) 0L else frames * 1000L / rate

  /** 80-bit IEEE 754 extended float at offset `i` (AIFF sample rate).
    * value = mantissa64 · 2^(exp − 16383 − 63); the integer bit is
    * explicit in the mantissa, so no implicit-1 fixup. */
  private def extended80(b: Array[Byte], i: Int): Double = {
    val signExp = be16(b, i)
    val exp = signExp & 0x7fff
    if (exp == 0) return 0.0
    val hi = be32(b, i + 2).toDouble // top 32 mantissa bits, unsigned
    val lo = be32(b, i + 6).toDouble
    val mag = math.scalb(hi, exp - 16383 - 31) + math.scalb(lo, exp - 16383 - 63)
    if ((signExp & 0x8000) != 0) -mag else mag
  }

  def parseWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var channels, rate, bits, blockAlign = 0
    var dataBytes = -1L
    var haveFmt = false
    while (i + 8 <= b.length) {
      val ct = tag(b, i)
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (ct == "fmt " && sz >= 16) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
        haveFmt = true
      } else if (ct == "data") {
        dataBytes = sz
      }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
    }
    if (!haveFmt || dataBytes < 0 || channels <= 0 || rate <= 0 || blockAlign <= 0) None
    else {
      val frames = dataBytes / blockAlign
      Some(AudioMeta("wav", channels, rate, bits, frames, durationMs(frames, rate)))
    }
  }

  def parseAiff(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 12 || tag(b, 0) != "FORM") return None
    val form = tag(b, 8)
    if (form != "AIFF" && form != "AIFC") return None
    var i = 12
    while (i + 8 <= b.length) {
      val ct = tag(b, i)
      val sz = be32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (ct == "COMM" && sz >= 18) {
        val channels = be16(b, i + 8)
        val frames = be32(b, i + 10)
        val bits = be16(b, i + 14)
        val rate = math.round(extended80(b, i + 16)).toInt
        return if (channels <= 0 || rate <= 0) None
        else Some(AudioMeta("aiff", channels, rate, bits, frames, durationMs(frames, rate)))
      }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  def parseAu(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 24 || be32(b, 0) != 0x2e736e64L) return None
    val dataSize = be32(b, 8)
    val encoding = be32(b, 12).toInt
    val rate = be32(b, 16).toInt
    val channels = be32(b, 20).toInt
    val bytesPerSample = encoding match {
      case 1 | 2 => 1 // μ-law / 8-bit linear PCM
      case 3 => 2; case 4 => 3; case 5 | 6 => 4; case 7 => 8
      case _ => return None
    }
    if (channels <= 0 || rate <= 0) return None
    // dataSize 0xffffffff means "unknown" per spec — fall back to the
    // actual bytes present past the (validated ≥24) data offset
    val dataOffset = be32(b, 4)
    val effSize =
      if (dataSize == 0xffffffffL) (b.length.toLong - dataOffset) max 0L else dataSize
    val frames = effSize / (bytesPerSample.toLong * channels)
    Some(AudioMeta("au", channels, rate, bytesPerSample * 8, frames,
      durationMs(frames, rate)))
  }

  /** Sniff the container by magic and parse its metadata. */
  def parse(b: Array[Byte]): Option[AudioMeta] =
    if (b == null) None
    else parseWav(b).orElse(parseAiff(b)).orElse(parseAu(b))

  /** Container-normalized 16-bit PCM extraction: the decoded,
    * INTERLEAVED signed sample values of a WAV / AIFF / AU payload —
    * the same integers regardless of the container's byte order (WAV
    * data is little-endian per RIFF; AIFF SSND and AU data are
    * big-endian), which is exactly what container-invariant audio
    * fingerprinting ([[AudioDedup]]) needs: two muxes of one
    * recording must decode to bit-identical sample arrays. Non-PCM16
    * payloads (μ-law AU, 8/24-bit) and unparseable containers → None.
    *
    * Chunk locations per the public specs: WAV `data` chunk payload;
    * AIFF `SSND` payload after its u32be offset + blockSize prologue,
    * honoring COMM's numSampleFrames (writers may pad the chunk);
    * AU samples at the header's u32be dataOffset. */
  def pcm16(b: Array[Byte]): Option[(AudioMeta, Array[Int])] = {
    if (b == null) return None
    def read(i0: Int, n: Int, bigEndian: Boolean): Option[Array[Int]] = {
      if (i0 < 0 || n < 0 || i0 + 2L * n > b.length) return None
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        val i = i0 + 2 * k
        out(k) =
          if (bigEndian) (b(i).toInt << 8) | u8(b, i + 1)
          else (b(i + 1).toInt << 8) | u8(b, i)
        k += 1
      }
      Some(out)
    }
    parse(b).filter(_.bits_per_sample == 16).flatMap { m =>
      val n = (m.n_frames * m.channels).toInt
      m.format match {
        case "wav" =>
          // re-walk the chunk list to the data payload offset
          var i = 12
          var at = -1
          while (at < 0 && i + 8 <= b.length) {
            if (tag(b, i) == "data") at = i + 8
            else i += 8 + le32(b, i + 4).toInt + (le32(b, i + 4).toInt & 1)
          }
          read(at, n, bigEndian = false).map((m, _))
        case "aiff" =>
          var i = 12
          var at = -1
          while (at < 0 && i + 8 <= b.length) {
            if (tag(b, i) == "SSND" && be32(b, i + 4) >= 8)
              at = i + 16 + be32(b, i + 8).toInt // skip offset+blockSize, honor offset
            else i += 8 + be32(b, i + 4).toInt + (be32(b, i + 4).toInt & 1)
          }
          read(at, n, bigEndian = true).map((m, _))
        case "au" =>
          read(be32(b, 4).toInt, n, bigEndian = true).map((m, _))
        case _ => None
      }
    }
  }
}
