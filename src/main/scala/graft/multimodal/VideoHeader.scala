package graft.multimodal

/** Pure-JVM video-container header parsing — the video leg of the
  * multimodal decode step, completing the [[ImageHeader]] /
  * [[AudioHeader]] family: byte slicing only, no codec dependency, so
  * video payloads yield REAL container metadata (dimensions, frame
  * count, duration) even in a container with no video libraries.
  * Sample decoding stays out of scope — headers are what a curation
  * pipeline gates on: resolution filters, duration caps, fps buckets.
  *
  * Formats, per their public specifications:
  *   - MP4 (ISO/IEC 14496-12 ISO Base Media File Format): a box walk —
  *     each box is a u32be size + 4-byte type, with size 1 escaping to
  *     a u64be `largesize` and size 0 meaning "to end of enclosure".
  *     Requires an `ftyp` box at top level, then reads `moov/mvhd`
  *     (timescale + movie duration; version 1 widens the timestamps
  *     and duration to 64 bits), the first `moov/trak/tkhd` with a
  *     nonzero 16.16-fixed width/height (the video track — audio
  *     tracks carry zero dimensions), and that track's
  *     `mdia/minf/stbl/stsz` sample count as the frame count.
  *   - AVI (Microsoft RIFF): `RIFF` + u32le size + `AVI `, then a
  *     chunk walk (4-byte tag + u32le size, padded to even) into the
  *     `LIST hdrl` for the 56-byte `avih` main header:
  *     dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight.
  *
  * Anything unparseable (truncated, corrupt, not video) → None —
  * callers decide whether that is a filter drop or stub fallback.
  */
object VideoHeader {

  /** Sniffed container metadata. `duration_ms` is integer arithmetic
    * on header fields — floor(duration·1000 / timescale) for MP4,
    * floor(frames·µsPerFrame / 1000) for AVI — so the oracle can
    * state it exactly. */
  case class VideoMeta(format: String, width: Int, height: Int,
      n_frames: Long, duration_ms: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")

  /** Walk ISO-BMFF child boxes of [from, to), returning the payload
    * span of the first box of `boxType`, or None. Malformed sizes
    * (overrun, smaller than the header) abort the walk. */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      boxType: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val sz0 = be32(b, i)
      var hdr = 8
      var sz = sz0
      if (sz0 == 1L) {
        if (i + 16 > to) return None
        sz = be64(b, i + 8); hdr = 16
      } else if (sz0 == 0L) sz = (to - i).toLong
      if (sz < hdr || sz > to - i) return None
      if (tag(b, i + 4) == boxType) return Some((i + hdr, i + sz.toInt))
      i += sz.toInt
    }
    None
  }

  /** (timescale, movie duration in timescale ticks) from an mvhd
    * payload — version 1 has 64-bit creation/modification times and
    * duration. */
  private def mvhdFields(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] = {
    if (e - s < 20) return None
    u8(b, s) match {
      case 0 => Some((be32(b, s + 12), be32(b, s + 16)))
      case 1 => if (e - s < 32) None else Some((be32(b, s + 20), be64(b, s + 24)))
      case _ => None
    }
  }

  /** (width, height) from a tkhd payload — the 16.16 fixed-point
    * dimensions after the version-dependent timestamps, 8 reserved
    * bytes, layer/alternate-group/volume/reserved shorts, and the
    * 36-byte transform matrix. */
  private def tkhdDims(b: Array[Byte], s: Int, e: Int): Option[(Int, Int)] = {
    val off = u8(b, s) match {
      case 0 => s + 4 + 20 + 16 + 36
      case 1 => s + 4 + 32 + 16 + 36
      case _ => return None
    }
    if (off + 8 > e) None
    else Some(((be32(b, off) >> 16).toInt, (be32(b, off + 4) >> 16).toInt))
  }

  /** Sample count from the video track's stsz (offset 8 in the
    * payload, after version/flags and the uniform sample size). */
  private def trakFrames(b: Array[Byte], trakS: Int, trakE: Int): Option[Long] =
    for {
      (ms, me) <- findBox(b, trakS, trakE, "mdia")
      (ns, ne) <- findBox(b, ms, me, "minf")
      (ss, se) <- findBox(b, ns, ne, "stbl")
      (zs, ze) <- findBox(b, ss, se, "stsz") if ze - zs >= 12
    } yield be32(b, zs + 8)

  def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    // top-level walk: the brand declaration must be present, and the
    // whole box sequence must be self-consistent (truncation → None)
    var hasFtyp = false
    var moov: Option[(Int, Int)] = None
    var i = 0
    while (i + 8 <= b.length) {
      val sz0 = be32(b, i)
      var hdr = 8
      var sz = sz0
      if (sz0 == 1L) {
        if (i + 16 > b.length) return None
        sz = be64(b, i + 8); hdr = 16
      } else if (sz0 == 0L) sz = (b.length - i).toLong
      if (sz < hdr || sz > b.length - i) return None
      tag(b, i + 4) match {
        case "ftyp" => hasFtyp = true
        case "moov" => moov = Some((i + hdr, i + sz.toInt))
        case _ => ()
      }
      i += sz.toInt
    }
    if (!hasFtyp) return None
    moov.flatMap { case (ms, me) =>
      for {
        (hs, he) <- findBox(b, ms, me, "mvhd")
        (timescale, duration) <- mvhdFields(b, hs, he) if timescale > 0
        (w, h, frames) <- firstVideoTrak(b, ms, me)
      } yield VideoMeta("mp4", w, h, frames, duration * 1000L / timescale)
    }
  }

  /** First trak whose tkhd carries nonzero dimensions — audio tracks
    * (zero width/height) are skipped, so a sound-first file still
    * resolves the video track's geometry and sample count. */
  private def firstVideoTrak(b: Array[Byte], from: Int,
      to: Int): Option[(Int, Int, Long)] = {
    var i = from
    while (i + 8 <= to) {
      val sz0 = be32(b, i)
      var hdr = 8
      var sz = sz0
      if (sz0 == 1L) {
        if (i + 16 > to) return None
        sz = be64(b, i + 8); hdr = 16
      } else if (sz0 == 0L) sz = (to - i).toLong
      if (sz < hdr || sz > to - i) return None
      if (tag(b, i + 4) == "trak") {
        val (ts, te) = (i + hdr, i + sz.toInt)
        findBox(b, ts, te, "tkhd").flatMap { case (ks, ke) =>
          tkhdDims(b, ks, ke)
        } match {
          case Some((w, h)) if w > 0 && h > 0 =>
            return trakFrames(b, ts, te).map(f => (w, h, f))
          case _ => () // dimensionless (audio/hint) track — keep walking
        }
      }
      i += sz.toInt
    }
    None
  }

  def parseAvi(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return None
    var i = 12
    while (i + 8 <= b.length) {
      val ct = tag(b, i)
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (ct == "LIST" && sz >= 4 && tag(b, i + 8) == "hdrl") {
        val end = i + 8 + sz.toInt
        var j = i + 12
        while (j + 8 <= end) {
          val c2 = tag(b, j)
          val s2 = le32(b, j + 4)
          if (s2 < 0 || j + 8 + s2 > end) return None
          if (c2 == "avih" && s2 >= 40) {
            val usPerFrame = le32(b, j + 8)
            val frames = le32(b, j + 8 + 16)
            val w = le32(b, j + 8 + 32).toInt
            val h = le32(b, j + 8 + 36).toInt
            return if (w <= 0 || h <= 0) None
            else Some(VideoMeta("avi", w, h, frames, frames * usPerFrame / 1000L))
          }
          j += 8 + s2.toInt + (s2.toInt & 1)
        }
        return None // an hdrl list without its main header is corrupt
      }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  /** Sniff the container by magic and parse its metadata. */
  def parse(b: Array[Byte]): Option[VideoMeta] =
    if (b == null) None
    else parseMp4(b).orElse(parseAvi(b))

  // ---- frame payload extraction (round-9: content-level dedup) ------

  /** Byte spans (offset, length) of the video track's frame payloads,
    * in presentation order — the demux step a per-frame perceptual
    * hash needs. MP4: the video trak's stsz sizes (uniform or
    * per-sample table) laid contiguously from the first stco chunk
    * offset (the single-chunk layout MJPEG-style files use; a
    * multi-chunk stsc mapping is out of scope and fails closed when
    * the spans overrun the file). AVI: the `movi` list's `00dc`/`00db`
    * chunk payloads in order. Unparseable → None; a span table that
    * overruns the payload → None (fail closed, never a torn frame). */
  def frameRanges(b: Array[Byte]): Option[Vector[(Int, Int)]] =
    if (b == null) None
    else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ")
      aviFrameRanges(b)
    else mp4FrameRanges(b)

  private def mp4FrameRanges(b: Array[Byte]): Option[Vector[(Int, Int)]] = {
    // reuse the validated top-level walk to find moov
    var hasFtyp = false
    var moov: Option[(Int, Int)] = None
    var i = 0
    while (i + 8 <= b.length) {
      val sz0 = be32(b, i)
      var hdr = 8
      var sz = sz0
      if (sz0 == 1L) {
        if (i + 16 > b.length) return None
        sz = be64(b, i + 8); hdr = 16
      } else if (sz0 == 0L) sz = (b.length - i).toLong
      if (sz < hdr || sz > b.length - i) return None
      tag(b, i + 4) match {
        case "ftyp" => hasFtyp = true
        case "moov" => moov = Some((i + hdr, i + sz.toInt))
        case _ => ()
      }
      i += sz.toInt
    }
    if (!hasFtyp) return None
    moov.flatMap { case (ms, me) => videoTrakStbl(b, ms, me) }
      .flatMap { case (ss, se) =>
        for {
          (zs, ze) <- findBox(b, ss, se, "stsz") if ze - zs >= 12
          (cs, ce) <- findBox(b, ss, se, "stco") if ce - cs >= 12
          sizes <- stszSizes(b, zs, ze)
          off0 = be32(b, cs + 8) if off0 >= 0
          spans <- laySpans(b.length, off0, sizes)
        } yield spans
      }
  }

  /** The stbl span of the first trak with nonzero tkhd dimensions —
    * the same video-track selection rule as [[firstVideoTrak]]. */
  private def videoTrakStbl(b: Array[Byte], from: Int,
      to: Int): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val sz0 = be32(b, i)
      var hdr = 8
      var sz = sz0
      if (sz0 == 1L) {
        if (i + 16 > to) return None
        sz = be64(b, i + 8); hdr = 16
      } else if (sz0 == 0L) sz = (to - i).toLong
      if (sz < hdr || sz > to - i) return None
      if (tag(b, i + 4) == "trak") {
        val (ts, te) = (i + hdr, i + sz.toInt)
        findBox(b, ts, te, "tkhd").flatMap { case (ks, ke) =>
          tkhdDims(b, ks, ke)
        } match {
          case Some((w, h)) if w > 0 && h > 0 =>
            return for {
              (msd, med) <- findBox(b, ts, te, "mdia")
              (ns, ne) <- findBox(b, msd, med, "minf")
              stbl <- findBox(b, ns, ne, "stbl")
            } yield stbl
          case _ => ()
        }
      }
      i += sz.toInt
    }
    None
  }

  /** stsz payload → per-sample sizes: uniform (sample_size ≠ 0) or
    * the per-sample entry table (sample_size = 0). */
  private def stszSizes(b: Array[Byte], zs: Int, ze: Int): Option[Vector[Int]] = {
    val uniform = be32(b, zs + 4)
    val count = be32(b, zs + 8)
    if (count < 0 || count > Int.MaxValue) return None
    val n = count.toInt
    if (uniform != 0L) {
      if (uniform > Int.MaxValue) None
      else Some(Vector.fill(n)(uniform.toInt))
    } else {
      if (ze - (zs + 12) < 4L * n) return None
      Some(Vector.tabulate(n) { k =>
        val v = be32(b, zs + 12 + 4 * k)
        if (v > Int.MaxValue) return None
        v.toInt
      })
    }
  }

  /** Lay `sizes` contiguously from `off0`, failing closed on overrun. */
  private def laySpans(len: Int, off0: Long,
      sizes: Vector[Int]): Option[Vector[(Int, Int)]] = {
    var off = off0
    val out = Vector.newBuilder[(Int, Int)]
    sizes.foreach { s =>
      if (s < 0 || off < 0 || off + s > len) return None
      out += ((off.toInt, s))
      off += s
    }
    Some(out.result())
  }

  private def aviFrameRanges(b: Array[Byte]): Option[Vector[(Int, Int)]] = {
    var i = 12
    while (i + 8 <= b.length) {
      val ct = tag(b, i)
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (ct == "LIST" && sz >= 4 && tag(b, i + 8) == "movi") {
        val end = i + 8 + sz.toInt
        var j = i + 12
        val out = Vector.newBuilder[(Int, Int)]
        while (j + 8 <= end) {
          val c2 = tag(b, j)
          val s2 = le32(b, j + 4)
          if (s2 < 0 || j + 8 + s2 > end) return None
          if (c2 == "00dc" || c2 == "00db") out += ((j + 8, s2.toInt))
          j += 8 + s2.toInt + (s2.toInt & 1)
        }
        return Some(out.result())
      }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }
}
