package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaDecoder, MediaFeatures, MediaRow}

/** Multimodal plumbing: per-partition decoder lifecycle, deterministic
  * stub features, frame sampling bounds. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("media fixture has binary payloads and kind routing") {
    val m = Multimodal.mediaFromDocuments(spark, dir)
    val kinds = m.toDF().groupBy($"kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    val row = m.head()
    assert(row.payload.nonEmpty)
  }

  test("feature extraction is deterministic and complete") {
    val m = Multimodal.mediaFromDocuments(spark, dir)
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f1.length === m.count())
    assert(f1.map(_.byte_entropy).toSeq === f2.map(_.byte_entropy).toSeq)
    assert(f1.forall(f => f.width >= 1 && f.width <= 1920))
    assert(f1.forall(f => f.byte_len > 0))
    // declared_ms passthrough for doc_id % 5 == 0
    val withDecl = f1.filter(_.media_id % 5 == 0)
    assert(withDecl.nonEmpty && withDecl.forall(f => f.duration_ms % 10 == 0))
  }

  test("decoder open/close lifecycle runs once per partition") {
    val m = Multimodal.mediaFromDocuments(spark, dir).repartition(3)
    val counts = spark.sparkContext.longAccumulator("opens")
    class CountingDecoder extends Multimodal.StubDecoder {
      override def open(): Unit = { counts.add(1); super.open() }
    }
    Multimodal.extractFeatures(m, () => new CountingDecoder).count()
    assert(counts.value === 3)
  }

  test("frame sampling caps frames, spaces them evenly, video rows only") {
    val m = Multimodal.mediaFromDocuments(spark, dir)
    val f = Multimodal.extractFeatures(m)
    val frames = Multimodal.sampleFrames(f, maxFrames = 4)
    val nVideo = f.filter(_.kind == "video").count()
    assert(frames.count() > 0)
    val perItem = frames.groupBy($"media_id").count()
    assert(perItem.filter($"count" > 4).count() === 0)
    assert(perItem.count() === nVideo)
    // evenly spaced: per item, indices are 0, step, 2·step, … with
    // step = ceil(n_frames/4), all < n_frames; offsets follow byte_len
    val feats = f.collect().map(x => x.media_id -> x).toMap
    frames.collect().groupBy(_.media_id).foreach { case (id, fs) =>
      val nf = feats(id).n_frames
      val step = (nf + 3) / 4
      val idx = fs.map(_.frame_idx).sorted.toSeq
      assert(idx === idx.indices.map(_ * step))
      assert(idx.forall(_ < nf))
      val bpf = feats(id).byte_len / nf
      assert(fs.forall(s => s.byte_offset == s.frame_idx.toLong * bpf))
    }
  }

  test("image headers parse real encoder output for png, jpeg, and gif") {
    import graft.multimodal.{ImageFixture, ImageHeader}
    Seq(("png", 17, 23), ("jpeg", 640, 480), ("gif", 4, 4),
        ("png", 1, 1), ("jpeg", 1, 1)).foreach { case (fmt, w, h) =>
      val bytes = ImageFixture.encode(fmt, w, h, id = 42L)
      val m = ImageHeader.parse(bytes)
      assert(m.contains(ImageHeader.ImageMeta(fmt, w, h)),
        s"$fmt ${w}x$h parsed as $m")
    }
  }

  test("image header parser rejects truncated, corrupt, and non-image bytes") {
    import graft.multimodal.{ImageFixture, ImageHeader}
    val png = ImageFixture.encode("png", 10, 10, 1L)
    val jpg = ImageFixture.encode("jpeg", 10, 10, 1L)
    assert(ImageHeader.parse(png.take(20)).isEmpty, "truncated png")
    assert(ImageHeader.parse(jpg.take(3)).isEmpty, "truncated jpeg")
    assert(ImageHeader.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeader.parse(Array.empty[Byte]).isEmpty)
    assert(ImageHeader.parse(null).isEmpty)
    // corrupt jpeg: break segment sync after SOI
    val corrupt = jpg.clone(); corrupt(2) = 0x00
    assert(ImageHeader.parse(corrupt).isEmpty, "desynced jpeg")
    // jpeg walk must skip an injected APP1 (EXIF-style) segment and
    // still find the SOF behind it: FF E1, len=0x0008 (2 len bytes +
    // 6 payload bytes: "Exif\0\0")
    val app1 = Array(0xff, 0xe1, 0x00, 0x08,
      'E'.toInt, 'x'.toInt, 'i'.toInt, 'f'.toInt, 0x00, 0x00).map(_.toByte)
    val withApp1 = jpg.take(2) ++ app1 ++ jpg.drop(2)
    assert(ImageHeader.parse(withApp1).contains(
      ImageHeader.ImageMeta("jpeg", 10, 10)), "APP1 not skipped")
  }

  test("audio headers parse real JDK encoder output for wav, aiff, and au") {
    import graft.multimodal.{AudioFixture, AudioHeader}
    // ids chosen to hit each format at varied rates/channels/frames
    Seq(0L, 1L, 2L, 3L, 7L, 58L, 96L, 123L).foreach { id =>
      val m = AudioHeader.parse(AudioFixture.encode(id))
      assert(m.isDefined, s"id $id did not parse")
      val a = m.get
      assert(a.format === AudioFixture.formatOf(id), s"id $id")
      assert(a.channels === AudioFixture.channelsOf(id))
      assert(a.sample_rate === AudioFixture.rateOf(id))
      assert(a.bits_per_sample === 16)
      assert(a.n_frames === AudioFixture.framesOf(id).toLong)
      assert(a.duration_ms === AudioFixture.durationMsOf(id))
    }
  }

  test("audio header parser rejects truncated, corrupt, and non-audio bytes") {
    import graft.multimodal.{AudioFixture, AudioHeader}
    val wav = AudioFixture.encode(0L)  // wav
    val aiff = AudioFixture.encode(1L) // aiff
    val au = AudioFixture.encode(2L)   // au
    assert(AudioHeader.parse(wav.take(10)).isEmpty, "truncated wav")
    assert(AudioHeader.parse(aiff.take(11)).isEmpty, "truncated aiff")
    assert(AudioHeader.parse(au.take(20)).isEmpty, "truncated au")
    assert(AudioHeader.parse("not audio".getBytes).isEmpty)
    assert(AudioHeader.parse(Array.empty[Byte]).isEmpty)
    assert(AudioHeader.parse(null).isEmpty)
    // a wav whose declared chunk size overruns the payload is corrupt
    val overrun = wav.clone()
    overrun(16) = 0x7f.toByte; overrun(17) = 0x7f.toByte // fmt size huge
    assert(AudioHeader.parse(overrun).isEmpty, "overrunning fmt chunk")
    // an AU with an unknown encoding code is rejected
    val badEnc = au.clone(); badEnc(15) = 99.toByte
    assert(AudioHeader.parse(badEnc).isEmpty, "unknown au encoding")
  }

  test("video headers parse spec-constructed mp4 and avi containers") {
    import graft.multimodal.{ImageFixture, VideoFixture, VideoHeader}
    // ids chosen to hit: both formats, version-1 mvhd/tkhd (id%7==0),
    // sound-first track order (mp4 with id%3==0), and varied geometry
    Seq(0L, 1L, 2L, 3L, 6L, 7L, 14L, 21L, 35L, 58L, 96L, 123L).foreach { id =>
      val m = VideoHeader.parse(VideoFixture.encode(id))
      assert(m.isDefined, s"id $id did not parse")
      val v = m.get
      assert(v.format === VideoFixture.formatOf(id), s"id $id")
      assert(v.width === VideoFixture.widthOf(id), s"id $id")
      assert(v.height === VideoFixture.heightOf(id), s"id $id")
      assert(v.n_frames === VideoFixture.framesOf(id).toLong,
        s"id $id — a first-trak (audio) stsz read would be off by 7")
      assert(v.duration_ms === VideoFixture.durationMsOf(id), s"id $id")
    }
  }

  test("video header parser rejects truncated, corrupt, and non-video bytes") {
    import graft.multimodal.{ImageFixture, VideoFixture, VideoHeader}
    val mp4 = VideoFixture.encode(0L) // mp4, v1 headers, sound-first
    val avi = VideoFixture.encode(1L) // avi
    assert(VideoHeader.parse(mp4.take(40)).isEmpty, "truncated mp4")
    assert(VideoHeader.parse(avi.take(40)).isEmpty, "truncated avi")
    assert(VideoHeader.parse("not a video container".getBytes).isEmpty)
    assert(VideoHeader.parse(Array.empty[Byte]).isEmpty)
    assert(VideoHeader.parse(null).isEmpty)
    // an mp4 without its brand declaration is not an mp4
    val ftypLen = java.nio.ByteBuffer.wrap(mp4.take(4)).getInt
    assert(VideoHeader.parse(mp4.drop(ftypLen)).isEmpty, "missing ftyp")
    // a box whose declared size overruns the payload is corrupt
    val overrun = mp4.clone()
    overrun(0) = 0x7f.toByte // ftyp size huge
    assert(VideoHeader.parse(overrun).isEmpty, "overrunning box")
    // an avi whose hdrl list lacks the avih main header is corrupt
    val noAvih = avi.clone()
    // avih tag sits right after RIFF(12) + LIST header(8) + 'hdrl'(4)
    assert(new String(noAvih, 24, 4, "US-ASCII") === "avih")
    noAvih(24) = 'x'.toByte
    assert(VideoHeader.parse(noAvih).isEmpty, "hdrl without avih")
  }

  test("resizeImages rescales real pixels to the integer fit-in-box target") {
    import graft.multimodal.{ImageFixture, ImageHeader, Multimodal}
    // fit arithmetic edges: inside-box unchanged, width-limited,
    // height-limited, exact aspect tie (cross-multiply equality takes
    // the width-limited branch), and the ≥1 floor on extreme aspect
    assert(Multimodal.fitWithin(10, 10, 32, 24) === ((10, 10)))
    assert(Multimodal.fitWithin(64, 12, 32, 24) === ((32, 6)))
    assert(Multimodal.fitWithin(10, 48, 32, 24) === ((5, 24)))
    assert(Multimodal.fitWithin(64, 48, 32, 24) === ((32, 24)))
    assert(Multimodal.fitWithin(1000, 4, 32, 24) === ((32, 1)))
    assert(Multimodal.fitWithin(4, 1000, 32, 24) === ((1, 24)))
    // end-to-end through real containers: the resized payload's own
    // headers must carry the target geometry in the source format
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", ImageFixture.encode("png", 64, 12, 1L), "t", None),
      Multimodal.MediaRow(2L, "image", ImageFixture.encode("jpeg", 10, 48, 2L), "t", None),
      Multimodal.MediaRow(3L, "image", ImageFixture.encode("gif", 10, 10, 3L), "t", None),
      Multimodal.MediaRow(4L, "video", Array[Byte](1, 2, 3), "t", None))
    val resized = Multimodal.resizeImages(
      spark.createDataset(rows), maxW = 32, maxH = 24)
      .collect().map(r => r.media_id -> r).toMap
    assert(ImageHeader.parse(resized(1L).payload)
      .contains(ImageHeader.ImageMeta("png", 32, 6)))
    assert(ImageHeader.parse(resized(2L).payload)
      .contains(ImageHeader.ImageMeta("jpeg", 5, 24)))
    // already inside the box: bytes pass through untouched
    assert(java.util.Arrays.equals(resized(3L).payload, rows(2).payload))
    // non-image kinds pass through untouched
    assert(java.util.Arrays.equals(resized(4L).payload, rows(3).payload))
  }

  test("header parsers are total: every truncation and byte-flip returns, never throws") {
    import graft.multimodal.{AudioFixture, AudioHeader, ImageFixture,
      ImageHeader, VideoFixture, VideoHeader}
    // At corpus scale the payload column is untrusted bytes — a parser
    // that throws (instead of returning None) kills the task and, with
    // it, the whole curation job. Deterministic adversarial sweep: for
    // each fixture, parse EVERY prefix and EVERY single-byte
    // corruption of the payload.
    def sweep(name: String, bytes: Array[Byte], parse: Array[Byte] => Option[Any]): Unit = {
      var i = 0
      while (i <= bytes.length) { // every truncation point, incl. empty
        try parse(java.util.Arrays.copyOf(bytes, i))
        catch { case e: Throwable => fail(s"$name: prefix $i threw $e") }
        i += 1
      }
      i = 0
      while (i < bytes.length) { // every single-byte corruption
        val mut = bytes.clone()
        mut(i) = (mut(i) ^ 0xa5).toByte
        try parse(mut)
        catch { case e: Throwable => fail(s"$name: flip at $i threw $e") }
        i += 1
      }
    }
    Seq(0L, 1L, 2L, 3L).foreach { id =>
      sweep(s"video id=$id", VideoFixture.encode(id), VideoHeader.parse)
      sweep(s"audio id=$id", AudioFixture.encode(id), AudioHeader.parse)
    }
    Seq("png", "jpeg", "gif").foreach { fmt =>
      sweep(s"image $fmt", ImageFixture.encode(fmt, 9, 7, 5L), ImageHeader.parse)
    }
  }

  test("AvHeaderDecoder yields real video metadata inside the partition lifecycle") {
    import graft.multimodal.{VideoFixture, Multimodal}
    val media = Multimodal.videosFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media,
      () => new Multimodal.AvHeaderDecoder).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width === VideoFixture.widthOf(f.media_id), s"media ${f.media_id}")
      assert(f.height === VideoFixture.heightOf(f.media_id))
      assert(f.n_frames === VideoFixture.framesOf(f.media_id))
      assert(f.duration_ms === VideoFixture.durationMsOf(f.media_id))
    }
  }

  test("AvHeaderDecoder yields real audio metadata inside the partition lifecycle") {
    import graft.multimodal.{AudioFixture, Multimodal}
    val media = Multimodal.audiosFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media,
      () => new Multimodal.AvHeaderDecoder).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.duration_ms === AudioFixture.durationMsOf(f.media_id), s"media ${f.media_id}")
      assert(f.n_frames === AudioFixture.framesOf(f.media_id))
      assert(f.width === 0 && f.height === 0)
    }
    // the stacked decoder still parses images like ImageHeaderDecoder
    val img = Multimodal.extractFeatures(
      Multimodal.imagesFromDocuments(spark, dir).limit(30),
      () => new Multimodal.AvHeaderDecoder).collect()
    img.foreach { f =>
      assert(f.width === graft.multimodal.ImageFixture.widthOf(f.media_id))
    }
  }

  test("ImageHeaderDecoder yields real dimensions inside the partition lifecycle") {
    import graft.multimodal.Multimodal, graft.multimodal.ImageFixture
    val media = Multimodal.imagesFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media,
      () => new Multimodal.ImageHeaderDecoder).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width === ImageFixture.widthOf(f.media_id), s"media ${f.media_id}")
      assert(f.height === ImageFixture.heightOf(f.media_id))
      assert(f.n_frames === 1 && f.duration_ms === 0L)
    }
    // non-image kinds keep stub features (no codecs for a/v)
    val av = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, dir).filter(_.kind != "image"),
      () => new Multimodal.ImageHeaderDecoder).collect()
    val stub = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, dir).filter(_.kind != "image")).collect()
    assert(av.sortBy(_.media_id).toSeq === stub.sortBy(_.media_id).toSeq)
  }

  test("perceptual hash: re-encodings collide, distinct patterns separate, corrupt drops") {
    import graft.multimodal.{ImageFixture, ImagePhash}
    // the near-dup contract on raw hashes: one pattern through all
    // three encoders must land within the Hamming threshold (the
    // margins are ±half range, so in practice identical); independent
    // patterns must sit far outside it
    (0L until 12L).foreach { group =>
      val hs = Seq("png", "jpeg", "gif").map(f =>
        ImagePhash.aHash64(ImageFixture.encodePattern(f, group)).get)
      for (a <- hs; b <- hs)
        assert(ImagePhash.hamming(a, b) <= 3,
          s"group $group re-encodings diverged: ${hs.map(_.toHexString)}")
    }
    val distinct = (0L until 24L).map(g =>
      ImagePhash.aHash64(ImageFixture.encodePattern("png", g)).get)
    for (i <- distinct.indices; j <- distinct.indices if i < j)
      assert(ImagePhash.hamming(distinct(i), distinct(j)) > 7,
        s"patterns $i and $j collided")
    // corrupt payloads drop out of the candidate space, never throw
    assert(ImagePhash.aHash64(Array[Byte]()) === None)
    assert(ImagePhash.aHash64("not an image".getBytes("UTF-8")) === None)
    assert(ImagePhash.aHash64(
      ImageFixture.encodePattern("png", 3L).take(40)) === None)
  }

  test("video demux: frameRanges recovers the exact frame payloads, fails closed") {
    import graft.multimodal.{ImageFixture, VideoFixture, VideoHeader}
    val jpegFrames = (0 until 5).map(f =>
      ImageFixture.encodePattern("jpeg", 7000L + f))
    val mp4 = VideoFixture.encodeMp4Frames(64, 64, jpegFrames)
    val mp4Ranges = VideoHeader.frameRanges(mp4).get
    assert(mp4Ranges.length === 5)
    mp4Ranges.zip(jpegFrames).foreach { case ((off, len), orig) =>
      assert(mp4.slice(off, off + len).toSeq === orig.toSeq,
        "mp4 sample span diverged from the muxed frame bytes")
    }
    val pngFrames = (0 until 5).map(f =>
      ImageFixture.encodePattern("png", 7000L + f))
    val avi = VideoFixture.encodeAviFrames(64, 64, pngFrames)
    val aviRanges = VideoHeader.frameRanges(avi).get
    assert(aviRanges.length === 5)
    aviRanges.zip(pngFrames).foreach { case ((off, len), orig) =>
      assert(avi.slice(off, off + len).toSeq === orig.toSeq,
        "avi 00dc span diverged from the muxed frame bytes")
    }
    // the metadata fixture's uniform-stsz containers demux too
    val uniform = VideoHeader.frameRanges(VideoFixture.encode(4L)).get
    assert(uniform.length === VideoFixture.framesOf(4L))
    assert(uniform.forall(_._2 === 16))
    // truncation/corruption fails closed, never a torn frame
    assert(VideoHeader.frameRanges(mp4.take(mp4.length - 3)) === None)
    assert(VideoHeader.frameRanges(avi.take(40)) === None)
    assert(VideoHeader.frameRanges("not a container".getBytes("UTF-8")) === None)
  }

  test("video near-dup: re-muxed pairs collide, distinct and partial matches reject") {
    import graft.multimodal.{ImageFixture, VideoDedup, VideoFixture}
    // 10 planted groups (mp4+jpeg vs avi+png of the same pixels), plus
    // one adversarial clip sharing group 0's frames EXCEPT frame 0
    // (always sampled) — near on most slots, not a duplicate
    val planted = (0L until 20L).map { id =>
      Multimodal.MediaRow(id, "video", VideoFixture.encodeNearDup(id), "t", None)
    }
    val g0n = VideoFixture.nearDupFramesOf(0L)
    val tampered = (0 until g0n).map { f =>
      ImageFixture.encodePattern("jpeg", if (f == 0) 999999L else f.toLong)
    }
    val rows = planted :+ Multimodal.MediaRow(100L, "video",
      VideoFixture.encodeMp4Frames(64, 64, tampered), "t", None)
    val media = spark.createDataset(rows)
    val fh = VideoDedup.videoFrameHashes(media, maxFrames = 4)
    // every clip demuxed: ≤4 slots each, ≥1 per clip
    val perClip = fh.groupBy($"media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perClip.keySet === rows.map(_.media_id).toSet)
    assert(perClip.values.forall(c => c >= 1 && c <= 4))
    val pairs = VideoDedup.nearDupPairs(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).map(g => (2 * g, 2 * g + 1)).toSet
    assert(pairs === expected,
      "video near-dup diverged from the planted re-mux pairs")
  }

  test("hamming dedup: rep collapse + cap match brute force, mass-dup stays linear") {
    import graft.ops.HammingDedup
    // adversarial shape at spec scale: 300 copies of ONE hash (every
    // band of every copy lands in the same bucket — the r8 verdict's
    // mass-duplicate logo), 10 diverse triples (identical within,
    // far apart across), and one planted CROSS-HASH near pair at
    // hamming exactly 3
    val massHash = 0x5a5a5a5a5a5a5a5aL
    val diverse = (0 until 10).map(g =>
      graft.multimodal.ImageFixture.mix64(0xbeef + g.toLong))
    val nearA = diverse.head
    val nearB = nearA ^ 0x7L // hamming 3 from nearA
    val rows: Seq[(Long, Long)] =
      (0L until 300L).map(i => (i, massHash)) ++
        diverse.zipWithIndex.flatMap { case (h, g) =>
          (0 until 3).map(m => (1000L + g * 3 + m, h)) } ++
        Seq((2000L, nearB))
    val hashed = rows.toDF("media_id", "ahash")

    // brute-force ground truth over the collected hash map
    val byId = rows.toMap
    val expected = (for {
      (a, ha) <- byId.toSeq; (b, hb) <- byId.toSeq
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).sorted

    for (cap <- Seq(None, Some(HammingDedup.CapBucket), Some(2))) {
      val got = HammingDedup.pairs64(hashed, "media_id", "ahash",
          nBands = 4, maxHamming = 3, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // Some(2) still exact here: the cap bounds DISTINCT-hash bucket
      // membership (11 distinct hashes spread over 16-bit buckets)
      // and identical-hash pairs never pass through banding at all
      assert(got === expected, s"pairs64(cap=$cap) diverged from brute force")
    }

    val clusters = HammingDedup.clusters64(hashed, "media_id", "ahash",
      nBands = 4, maxHamming = 3)
    val labels = clusters.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size === rows.size, "cluster labels dropped members")
    // mass group labels to its min id
    (0L until 300L).foreach(i => assert(labels(i) === 0L))
    // the near pair joins diverse.head's triple into one component
    // rooted at the triple's min id
    assert(labels(2000L) === 1000L)
    (0 until 3).foreach(m => assert(labels(1000L + m) === 1000L))
    // remaining triples are their own components
    (1 until 10).foreach { g =>
      (0 until 3).foreach(m =>
        assert(labels(1000L + g * 3 + m) === 1000L + g * 3))
    }
  }

  test("audio pcm16 decodes identical samples from all three containers") {
    import graft.multimodal.{AudioFixture, AudioHeader}
    // the q_audio_meta fixture (stereo, varied rates) round-trips
    // through every JDK writer to the same interleaved sample values
    (0L until 30L).foreach { id =>
      val (meta, samples) = AudioHeader.pcm16(AudioFixture.encode(id))
        .getOrElse(fail(s"pcm16 failed for id=$id (${AudioFixture.formatOf(id)})"))
      assert(meta.format === AudioFixture.formatOf(id))
      assert(samples.length === AudioFixture.framesOf(id) * AudioFixture.channelsOf(id))
      // regenerate the writer's input PCM arithmetically
      val expected = (0 until samples.length).map(i =>
        ((id * 31 + i * 7) % 65536 - 32768).toInt)
      assert(samples.toSeq === expected,
        s"container ${meta.format} did not decode to the source samples")
    }
    // non-audio / truncated payloads are filter-drops, not errors
    assert(AudioHeader.pcm16("not audio".getBytes("UTF-8")) === None)
    assert(AudioHeader.pcm16(Array[Byte]()) === None)
  }

  test("audio fingerprint: container-invariant, gain-invariant, remaster within 2 bits") {
    import graft.multimodal.{AudioDedup, AudioFixture}
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val fps = (0L until 90L).map(id =>
      id -> AudioDedup.fingerprint64(AudioFixture.encodeNearDup(id))
        .getOrElse(fail(s"fingerprint failed for id=$id")))
      .toMap
    (0L until 30L).foreach { g =>
      // wav vs aiff mux of the same recording: identical fingerprint
      assert(fps(3 * g) === fps(3 * g + 1),
        s"group $g: container change moved the fingerprint")
      // remastered member (half volume + one altered window): ≤ 2 bits
      assert(ham(fps(3 * g), fps(3 * g + 2)) <= 2,
        s"group $g: remaster exceeded the 2-bit perturbation bound")
    }
    // independent recordings are far apart — no cross-group pair
    // survives the Hamming ≤ 3 verification
    for (g <- 0L until 30L; h <- (g + 1) until 30L)
      assert(ham(fps(3 * g), fps(3 * h)) > 3,
        s"groups $g/$h collided across independent recordings")
  }

  test("audio fingerprint: rate-normalized — a resampled remaster still collides") {
    import graft.multimodal.{AudioDedup, AudioFixture, AudioHeader}
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def wav(samples: Array[Int], rate: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = samples(i).toByte
        pcm(2 * i + 1) = (samples(i) >> 8).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream(pcm.length + 64)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    (0L until 10L).foreach { g =>
      val orig = AudioFixture.encodeNearDup(3 * g) // member 0: wav
      val (meta, s) = AudioHeader.pcm16(orig).getOrElse(
        fail(s"group $g: wav member did not decode"))
      // the same recording delivered at 2× the rate (sample repeat —
      // exactly how the analog waveform samples at double rate)
      val up = Array.tabulate(s.length * 2)(i => s(i / 2))
      // and at 3/2 the rate (non-integer ratio, linear interpolation).
      // No DOWNSAMPLE case: the fixture's square wave alternates every
      // frame — content AT the source Nyquist — so any lower rate
      // cannot represent it (aliasing destroys the recording itself,
      // not the fingerprint); real remasters only resample content
      // below the target Nyquist.
      val dn = Array.tabulate(s.length * 3 / 2) { i =>
        val num = i.toLong * 2
        val idx = (num / 3).toInt
        val frac = num % 3
        val nxt = math.min(idx + 1, s.length - 1)
        ((s(idx).toLong * (3 - frac) + s(nxt).toLong * frac) / 3).toInt
      }
      val f0 = AudioDedup.fingerprint64(orig)
        .getOrElse(fail(s"group $g: no fingerprint for original"))
      val fu = AudioDedup.fingerprint64(wav(up, meta.sample_rate * 2))
        .getOrElse(fail(s"group $g: no fingerprint for 2x resample"))
      val fd = AudioDedup.fingerprint64(wav(dn, meta.sample_rate * 3 / 2))
        .getOrElse(fail(s"group $g: no fingerprint for 3/2 resample"))
      assert(ham(f0, fu) <= 3,
        s"group $g: 2x resample moved ${ham(f0, fu)} bits — outside the band join")
      assert(ham(f0, fd) <= 3,
        s"group $g: 3/2 resample moved ${ham(f0, fd)} bits — outside the band join")
    }
    // resampling must not create cross-recording collisions either
    val a0 = AudioDedup.fingerprint64(AudioFixture.encodeNearDup(0)).get
    val b0 = AudioDedup.fingerprint64(AudioFixture.encodeNearDup(33)).get
    assert(ham(a0, b0) > 3, "independent recordings collided after normalization")
  }

  test("audio near-dup emits exactly the planted triples") {
    import graft.multimodal.AudioDedup
    val fp = AudioDedup.audioFingerprints(
      AudioDedup.nearDupAudiosFromDocuments(spark, dir))
    val pairs = AudioDedup.nearDupPairs(fp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = graft.io.Tables.documents(spark, dir).count()
    val expected = (for {
      a <- 0L until n; b <- (a + 1) until n if a / 3 == b / 3
    } yield (a, b)).toSet
    assert(pairs === expected,
      "audio near-dup diverged from the planted triple structure")
  }
}
