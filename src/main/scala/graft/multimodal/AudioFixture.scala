package graft.multimodal

/** Deterministic tiny-clip generation through the JDK's own
  * `javax.sound.sampled` encoders (WAVE / AIFF / AU file writers) — the
  * fixture side of q_audio_meta, mirroring [[ImageFixture]]. Every
  * parameter is pure arithmetic on the id so the DuckDB oracle can
  * state the expected parse results without seeing any bytes, while
  * the payloads are genuine encoder output (canonical RIFF chunk
  * layout, AIFF 80-bit extended-float rates, AU big-endian headers),
  * not hand-crafted byte strings. */
object AudioFixture {
  private val Formats = Vector("wav", "aiff", "au")
  private val Rates = Vector(8000, 11025, 16000, 22050, 44100)

  def formatOf(id: Long): String = Formats((((id % 3) + 3) % 3).toInt)
  def rateOf(id: Long): Int = Rates((((id % 5) + 5) % 5).toInt)
  def channelsOf(id: Long): Int = (((id % 2) + 2) % 2).toInt + 1
  def framesOf(id: Long): Int = (((id % 97) + 97) % 97).toInt + 50
  def bitsOf(id: Long): Int = 16
  def durationMsOf(id: Long): Long = framesOf(id).toLong * 1000L / rateOf(id)

  private def fileType(format: String): javax.sound.sampled.AudioFileFormat.Type =
    format match {
      case "wav" => javax.sound.sampled.AudioFileFormat.Type.WAVE
      case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
      case "au" => javax.sound.sampled.AudioFileFormat.Type.AU
      case other => throw new IllegalArgumentException(s"no audio writer for $other")
    }

  /** Encode id-derived 16-bit PCM via the JDK writer for the id's
    * format. WAV is little-endian per RIFF; AIFF/AU are big-endian. */
  def encode(id: Long): Array[Byte] = {
    val format = formatOf(id)
    val rate = rateOf(id)
    val channels = channelsOf(id)
    val frames = framesOf(id)
    val bigEndian = format != "wav"
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, bigEndian)
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      val s = ((id * 31 + i * 7) % 65536 - 32768).toInt // deterministic tone-ish ramp
      if (bigEndian) { pcm(2 * i) = (s >> 8).toByte; pcm(2 * i + 1) = s.toByte }
      else { pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream(pcm.length + 64)
    javax.sound.sampled.AudioSystem.write(ais, fileType(format), out)
    out.toByteArray
  }
}
