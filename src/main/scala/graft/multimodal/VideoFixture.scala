package graft.multimodal

/** Deterministic tiny-clip container generation — the fixture side of
  * q_video_meta, completing the [[ImageFixture]] / [[AudioFixture]]
  * family. Unlike image (ImageIO) and audio (javax.sound.sampled), the
  * JDK ships no video muxer, so the payloads are constructed directly
  * from the public container specifications — but as FULL structures,
  * not just the fields the parser reads: the MP4 carries a complete
  * `ftyp`/`mdat`/`moov` box tree (movie + track headers, media/handler/
  * sample-table boxes, a visual sample entry, chunk offsets into a
  * real mdat), every seventh clip uses version-1 64-bit movie/track
  * headers, and every third leads with a dimensionless AUDIO track
  * whose sample table disagrees with the video track's — so a parser
  * that grabs the first trak, misreads the version-dependent offsets,
  * or walks chunk padding wrong is caught. The AVI carries the
  * `hdrl` (avih + a full `vids` stream header + BITMAPINFOHEADER) and
  * a `movi` list with one `00dc` chunk per frame.
  *
  * Every parameter is pure arithmetic on the id so the DuckDB oracle
  * can state the expected parse results without seeing any bytes.
  * The frame rates all divide the 600-tick MP4 movie timescale, so
  * MP4 duration_ms = floor(frames·1000/fps) exactly; AVI duration
  * goes through the header's integer µs-per-frame:
  * floor(frames·floor(10⁶/fps)/1000).
  */
object VideoFixture {
  private val Formats = Vector("mp4", "avi")
  private val Fps = Vector(10, 12, 20, 24, 25) // all divide timescale 600
  private val Timescale = 600L

  def formatOf(id: Long): String = Formats((((id % 2) + 2) % 2).toInt)
  def fpsOf(id: Long): Int = Fps((((id % 5) + 5) % 5).toInt)
  def widthOf(id: Long): Int = (((id % 113) + 113) % 113).toInt + 16
  def heightOf(id: Long): Int = (((id % 67) + 67) % 67).toInt + 16
  def framesOf(id: Long): Int = (((id % 89) + 89) % 89).toInt + 24

  def durationMsOf(id: Long): Long = {
    val f = framesOf(id).toLong
    val fps = fpsOf(id)
    if (formatOf(id) == "mp4") f * 1000L / fps
    else f * (1000000L / fps) / 1000L
  }

  def encode(id: Long): Array[Byte] =
    if (formatOf(id) == "mp4") encodeMp4(id) else encodeAvi(id)

  // ---- near-dup fixture (round-9: content-level video dedup) --------
  //
  // Consecutive PAIRS of doc ids form one group (group = id / 2)
  // sharing identical per-frame PIXEL content; the even member muxes
  // as MP4 with JPEG frame samples, the odd as AVI with PNG `00dc`
  // frames — so the pair exists only at the decoded-frame level
  // (different container AND different frame codec), the video twin
  // of [[ImageFixture.encodePattern]]'s re-encoded duplicates.
  // Frame pixels are 64×64 block patterns seeded by (group, frame)
  // so distinct groups sit near Hamming 32 per frame while a group's
  // two encodings agree within the aHash codec-noise margin.

  def nearDupFormatOf(id: Long): String = Formats((((id % 2) + 2) % 2).toInt)
  def nearDupFramesOf(group: Long): Int = (((group % 5) + 5) % 5).toInt + 4
  private def framePatternSeed(group: Long, frame: Int): Long =
    group * 131L + frame

  def encodeNearDup(id: Long): Array[Byte] = {
    val group = id / 2
    val n = nearDupFramesOf(group)
    if (nearDupFormatOf(id) == "mp4") {
      val frames = (0 until n).map(f =>
        ImageFixture.encodePattern("jpeg", framePatternSeed(group, f)))
      encodeMp4Frames(64, 64, frames)
    } else {
      val frames = (0 until n).map(f =>
        ImageFixture.encodePattern("png", framePatternSeed(group, f)))
      encodeAviFrames(64, 64, frames)
    }
  }

  /** MP4 with REAL per-sample frame payloads (MJPEG-style): mdat is
    * the concatenation of the encoded frames, stsz carries PER-SAMPLE
    * sizes (sample_size = 0 + entry table — codec frames are never
    * uniform), stco points at the first sample, one chunk. */
  def encodeMp4Frames(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val fps = 10
    val ticksPerFrame = Timescale / fps
    val duration = frames.length.toLong * ticksPerFrame
    val ftyp = box("ftyp", ascii("isom"), be32(0x200), ascii("isom"), ascii("mp41"))
    val mdat = box("mdat", cat(frames: _*))
    val mdatOffset = ftyp.length + 8L
    val stszEntries = cat(frames.map(f => be32(f.length.toLong)): _*)
    val stblBox = box("stbl", stsdVideo(w, h),
      box("stts", zeros(4), be32(1), be32(frames.length), be32(ticksPerFrame)),
      box("stsc", zeros(4), be32(1), be32(1), be32(frames.length), be32(1)),
      box("stsz", zeros(4), be32(0), be32(frames.length), stszEntries),
      box("stco", zeros(4), be32(1), be32(mdatOffset)))
    val trak = box("trak",
      tkhd(0, trackId = 1, duration, w, h, audio = false),
      box("mdia", mdhd(duration), hdlr("vide", "VideoHandler"),
        box("minf",
          box("vmhd", Array[Byte](0, 0, 0, 1), zeros(8)),
          Dinf, stblBox)))
    cat(ftyp, mdat, box("moov", mvhd(0, duration), trak))
  }

  /** AVI whose `00dc` movi chunks carry REAL encoded frame payloads. */
  def encodeAviFrames(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val fps = 10
    val usPerFrame = 1000000L / fps
    val avih = chunk("avih", cat(
      le32(usPerFrame), le32(w.toLong * h * 3 * fps), le32(0), le32(0),
      le32(frames.length), le32(0), le32(1), le32(0),
      le32(w), le32(h), zeros(16)))
    val strh = chunk("strh", cat(
      ascii("vids"), ascii("MJPG"), le32(0), le16(0), le16(0), le32(0),
      le32(1), le32(fps), le32(0), le32(frames.length),
      le32(w.toLong * h * 3), le32(0xffffffffL), le32(0),
      le16(0), le16(0), le16(w), le16(h)))
    val strf = chunk("strf", cat(
      le32(40), le32(w), le32(h), le16(1), le16(24),
      le32(0), le32(w.toLong * h * 3), le32(0), le32(0), le32(0), le32(0)))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", frames.map(chunk("00dc", _)): _*)
    val body = cat(hdrl, movi)
    cat(ascii("RIFF"), le32(4L + body.length), ascii("AVI "), body)
  }

  // ---- byte builders ------------------------------------------------

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def zeros(n: Int): Array[Byte] = new Array[Byte](n)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = cat(be32(v >>> 32), be32(v & 0xffffffffL))
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  // ---- MP4 (ISO base media file format) -----------------------------

  private def box(tp: String, parts: Array[Byte]*): Array[Byte] = {
    val body = cat(parts: _*)
    cat(be32(8L + body.length), ascii(tp), body)
  }

  private val UnityMatrix = cat(
    be32(0x10000), be32(0), be32(0),
    be32(0), be32(0x10000), be32(0),
    be32(0), be32(0), be32(0x40000000L))

  private def mvhd(v: Int, duration: Long): Array[Byte] = {
    val times =
      if (v == 1) cat(be64(0), be64(0), be32(Timescale), be64(duration))
      else cat(be32(0), be32(0), be32(Timescale), be32(duration))
    box("mvhd", Array(v.toByte), zeros(3), times,
      be32(0x00010000L), be16(0x0100), zeros(2), zeros(8), // rate 1.0, volume 1.0
      UnityMatrix, zeros(24), be32(4)) // pre_defined ×6, next_track_ID
  }

  private def tkhd(v: Int, trackId: Long, duration: Long,
      w: Int, h: Int, audio: Boolean): Array[Byte] = {
    val times =
      if (v == 1) cat(be64(0), be64(0), be32(trackId), be32(0), be64(duration))
      else cat(be32(0), be32(0), be32(trackId), be32(0), be32(duration))
    box("tkhd", Array(v.toByte), Array[Byte](0, 0, 7), times, // enabled+in-movie
      zeros(8), be16(0), be16(0), be16(if (audio) 0x0100 else 0), be16(0),
      UnityMatrix, be32(w.toLong << 16), be32(h.toLong << 16))
  }

  private def mdhd(duration: Long): Array[Byte] =
    box("mdhd", zeros(4), be32(0), be32(0), be32(Timescale), be32(duration),
      be16(0x55c4), be16(0)) // language 'und'

  private def hdlr(handler: String, name: String): Array[Byte] =
    box("hdlr", zeros(4), be32(0), ascii(handler), zeros(12),
      ascii(name), Array[Byte](0))

  private val Dinf = box("dinf",
    box("dref", zeros(4), be32(1), box("url ", Array[Byte](0, 0, 0, 1))))

  private def stsdVideo(w: Int, h: Int): Array[Byte] = {
    val compressor = cat(Array[Byte](4), ascii("none"), zeros(27)) // pascal-string 32B
    val mp4v = box("mp4v", zeros(6), be16(1), // data_reference_index
      be16(0), be16(0), zeros(12),
      be16(w), be16(h), be32(0x00480000L), be32(0x00480000L), // 72 dpi
      be32(0), be16(1), compressor, be16(24), be16(0xffff))
    box("stsd", zeros(4), be32(1), mp4v)
  }

  private def stsdAudio: Array[Byte] = {
    val mp4a = box("mp4a", zeros(6), be16(1),
      zeros(8), be16(2), be16(16), be16(0), be16(0), be32(44100L << 16))
    box("stsd", zeros(4), be32(1), mp4a)
  }

  private def stbl(stsd: Array[Byte], sampleCount: Int, ticksPerSample: Long,
      sampleSize: Int, dataOffset: Long): Array[Byte] =
    box("stbl", stsd,
      box("stts", zeros(4), be32(1), be32(sampleCount), be32(ticksPerSample)),
      box("stsc", zeros(4), be32(1), be32(1), be32(sampleCount), be32(1)),
      box("stsz", zeros(4), be32(sampleSize), be32(sampleCount)), // uniform size
      box("stco", zeros(4), be32(1), be32(dataOffset)))

  private def encodeMp4(id: Long): Array[Byte] = {
    val v = if (id % 7 == 0) 1 else 0
    val w = widthOf(id)
    val h = heightOf(id)
    val frames = framesOf(id)
    val fps = fpsOf(id)
    val ticksPerFrame = Timescale / fps
    val duration = frames.toLong * ticksPerFrame
    val ftyp = box("ftyp", ascii("isom"), be32(0x200), ascii("isom"), ascii("mp41"))
    val frameBytes = 16
    val mdatPayload = new Array[Byte](frames * frameBytes)
    var i = 0
    while (i < mdatPayload.length) {
      mdatPayload(i) = ((id * 131 + i * 17) & 0xff).toByte
      i += 1
    }
    val mdat = box("mdat", mdatPayload)
    val mdatOffset = ftyp.length + 8L // mdat-before-moov: offset known upfront
    val videoTrak = box("trak",
      tkhd(v, trackId = 1, duration, w, h, audio = false),
      box("mdia", mdhd(duration), hdlr("vide", "VideoHandler"),
        box("minf",
          box("vmhd", Array[Byte](0, 0, 0, 1), zeros(8)),
          Dinf,
          stbl(stsdVideo(w, h), frames, ticksPerFrame, frameBytes, mdatOffset))))
    // a sound-first file: dimensionless tkhd, a DIFFERENT stsz count —
    // a parser that takes the first trak reads the wrong frame count
    val audioTrak =
      if (id % 3 != 0) Array.empty[Byte]
      else box("trak",
        tkhd(v, trackId = 2, duration, w = 0, h = 0, audio = true),
        box("mdia", mdhd(duration), hdlr("soun", "SoundHandler"),
          box("minf",
            box("smhd", zeros(4), be16(0), be16(0)),
            Dinf,
            stbl(stsdAudio, frames + 7, ticksPerSample = 1,
              sampleSize = 2, mdatOffset))))
    val moov = box("moov", mvhd(v, duration), audioTrak, videoTrak)
    cat(ftyp, mdat, moov)
  }

  // ---- AVI (RIFF) ---------------------------------------------------

  private def chunk(tp: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    cat(ascii(tp), le32(payload.length), payload, pad)
  }

  private def list(listType: String, parts: Array[Byte]*): Array[Byte] = {
    val body = cat(parts: _*)
    cat(ascii("LIST"), le32(4L + body.length), ascii(listType), body)
  }

  private def encodeAvi(id: Long): Array[Byte] = {
    val w = widthOf(id)
    val h = heightOf(id)
    val frames = framesOf(id)
    val fps = fpsOf(id)
    val usPerFrame = 1000000L / fps
    val avih = chunk("avih", cat(
      le32(usPerFrame), le32(w.toLong * h * 3 * fps), le32(0), le32(0),
      le32(frames), le32(0), le32(1), le32(0),
      le32(w), le32(h), zeros(16)))
    val strh = chunk("strh", cat(
      ascii("vids"), ascii("DIB "), le32(0), le16(0), le16(0), le32(0),
      le32(1), le32(fps), le32(0), le32(frames), // scale/rate/start/length
      le32(w.toLong * h * 3), le32(0xffffffffL), le32(0),
      le16(0), le16(0), le16(w), le16(h))) // rcFrame
    val strf = chunk("strf", cat( // BITMAPINFOHEADER
      le32(40), le32(w), le32(h), le16(1), le16(24),
      le32(0), le32(w.toLong * h * 3), le32(0), le32(0), le32(0), le32(0)))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val frameData = (0 until frames).map { f =>
      val payload = new Array[Byte](8)
      var i = 0
      while (i < 8) { payload(i) = ((id * 131 + f * 17 + i) & 0xff).toByte; i += 1 }
      chunk("00dc", payload)
    }
    val movi = list("movi", frameData: _*)
    val body = cat(hdrl, movi)
    cat(ascii("RIFF"), le32(4L + body.length), ascii("AVI "), body)
  }
}
