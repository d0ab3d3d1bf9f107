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

  // ---- near-dup fixture (q_audio_neardup) -------------------------
  //
  // Consecutive triples of doc ids form one GROUP (group = id / 3)
  // sharing one recording, muxed per member in a different container
  // (wav / aiff / au by id % 3) — so the duplicates exist only after
  // container-normalized decode, never at byte level. The third
  // member is additionally REMASTERED: volume halved (every sample
  // exactly ±A/2 — levels are even, so integer halving is exact) and
  // ONE window's level altered, perturbing at most the two
  // energy-delta fingerprint bits adjacent to that window. The
  // fingerprint ([[AudioDedup.fingerprint64]]) is deliberately
  // gain-invariant (delta SIGNS survive uniform scaling), so the
  // remaster lands at Hamming ≤ 2 from its group — inside the band
  // join's ≤ 3 — while independent groups sit near 32.
  //
  // The recording itself: NDWindows windows × NDWindowLen frames of a
  // ±A square wave, A drawn per window from three well-separated
  // levels (adjacent windows forced to DIFFERENT levels, so adjacent
  // window energies always differ by ≥ 9× and no comparison is ever
  // a near-tie that rounding could flip). Pure integer arithmetic
  // from the group seed → the oracle restates membership without
  // seeing any bytes.

  val NDWindows = 65 // 64 delta bits need 65 windows
  val NDWindowLen = 16
  val NDFrames: Int = NDWindows * NDWindowLen
  private val NDLevels = Vector(2000, 6000, 18000)
  val NDAlteredWindow = 13

  private def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L

  /** Level index per window for a group: pseudo-random over the three
    * levels with adjacent windows forced distinct. */
  private[multimodal] def ndLevelIdx(group: Long): Array[Int] = {
    val idx = new Array[Int](NDWindows)
    var x = lcg(group ^ 0x5d1f00d5eedL)
    var w = 0
    while (w < NDWindows) {
      x = lcg(x)
      val pick = (((x >>> 33) % 3) + 3).toInt % 3
      idx(w) =
        if (w > 0 && pick == idx(w - 1)) (pick + 1) % 3
        else pick
      w += 1
    }
    idx
  }

  /** The group recording as mono PCM16 samples; member 2's remaster
    * alters window [[NDAlteredWindow]]'s level (cycled to the next of
    * the three — it may now EQUAL a neighbor's level, which is fine:
    * halving ±even-A squares is exact, so even an exact energy tie
    * compares identically before and after the gain) and halves
    * every sample. */
  private[multimodal] def ndSamples(group: Long, remaster: Boolean): Array[Int] = {
    val idx = ndLevelIdx(group)
    if (remaster)
      idx(NDAlteredWindow) = (idx(NDAlteredWindow) + 1) % 3
    val out = new Array[Int](NDFrames)
    var f = 0
    while (f < NDFrames) {
      val a = NDLevels(idx(f / NDWindowLen))
      val s = if ((f & 1) == 0) a else -a
      out(f) = if (remaster) s / 2 else s
      f += 1
    }
    out
  }

  /** Near-dup member payload for a doc id: the id's GROUP recording
    * in the id's container (member 2 remastered), 16-bit mono at the
    * group's rate. */
  def encodeNearDup(id: Long): Array[Byte] = {
    val group = id / 3
    val member = (((id % 3) + 3) % 3).toInt
    val samples = ndSamples(group, remaster = member == 2)
    val format = Formats(member)
    val bigEndian = format != "wav"
    val fmt = new javax.sound.sampled.AudioFormat(
      rateOf(group).toFloat, 16, 1, true, bigEndian)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (bigEndian) { pcm(2 * i) = (s >> 8).toByte; pcm(2 * i + 1) = s.toByte }
      else { pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream(pcm.length + 64)
    javax.sound.sampled.AudioSystem.write(ais, fileType(format), out)
    out.toByteArray
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
