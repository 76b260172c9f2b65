package graft

import graft.operators.{MediaCodecs, Multimodal}

/** Pure-JVM codec tests: byte-level roundtrips plus the format quirks the
  * oracle roundtrip queries (q148/q149) cannot reach — top-down BMPs,
  * non-canonical RIFF chunk layouts, and rejection of non-media payloads
  * (which must fall back to the stub path, not throw).
  */
class MediaCodecsSpec extends SparkTestBase {

  test("bmp roundtrip recovers logical pixels across all four padding classes") {
    for (w <- 8 to 16; h <- Seq(4, 7)) { // 3w mod 4 cycles 0,3,2,1
      val px = (x: Int, y: Int) => ((x * 7 + y) % 256, (y * 11 + 3) % 256, (x + y * 5) % 256)
      val bytes = MediaCodecs.encodeBmp24(w, h, px)
      assert(bytes.length == MediaCodecs.bmpFileSize(w, h))
      val img = MediaCodecs.decodeBmp24(bytes).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == px(x, y), s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("bmp decoder handles TOP-DOWN storage (negative height)") {
    val w = 5; val h = 3
    val bottomUp = MediaCodecs.encodeBmp24(w, h, (x, y) => (y * 10 + x, 0, 0))
    // rewrite the height field to -h: rows are then stored top-down, so the
    // same pixel array must come back from the UNflipped read
    val topDown = bottomUp.clone()
    val neg = -h
    topDown(22) = (neg & 0xff).toByte
    topDown(23) = ((neg >> 8) & 0xff).toByte
    topDown(24) = ((neg >> 16) & 0xff).toByte
    topDown(25) = ((neg >> 24) & 0xff).toByte
    val a = MediaCodecs.decodeBmp24(bottomUp).get
    val b = MediaCodecs.decodeBmp24(topDown).get
    assert(b.height == h)
    // flipping storage order while keeping bytes reverses the row order
    for (y <- 0 until h; x <- 0 until w)
      assert(b.pixels(y * w + x) == a.pixels((h - 1 - y) * w + x))
  }

  test("wav roundtrip recovers samples, rate, and channel count") {
    val samples = Array.tabulate(97)(i => ((i * 1031) % 4001 - 2000).toShort)
    val bytes = MediaCodecs.encodeWavPcm16(12000, samples)
    assert(bytes.length == MediaCodecs.wavFileSize(97))
    val a = MediaCodecs.decodeWavPcm16(bytes).get
    assert(a.sampleRate == 12000 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("wav decoder walks past unknown odd-sized chunks (RIFF pad rule)") {
    val samples = Array[Short](100, -200, 300)
    val canonical = MediaCodecs.encodeWavPcm16(8000, samples)
    // splice a 5-byte LIST chunk (odd => 1 pad byte) between fmt and data
    val head = canonical.slice(0, 36) // RIFF..fmt chunk end
    val tail = canonical.slice(36, canonical.length) // data chunk
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = head ++ list ++ tail
    // RIFF size field must cover the new bytes for a well-formed file
    val newSize = spliced.length - 8
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    val a = MediaCodecs.decodeWavPcm16(spliced).get
    assert(a.sampleRate == 8000 && a.samples.toSeq == samples.toSeq)
  }

  test("G.711 mu-law/A-law expand to the CCITT reference values and roundtrip the container") {
    // reference points from the public tables: codec zeros, both extremes
    assert(MediaCodecs.mulawExpand(0xff) == 0)
    assert(MediaCodecs.mulawExpand(0x7f) == 0)
    assert(MediaCodecs.mulawExpand(0x80) == 32124)
    assert(MediaCodecs.mulawExpand(0x00) == -32124)
    assert(MediaCodecs.alawExpand(0x55) == -8)
    assert(MediaCodecs.alawExpand(0xd5) == 8)
    assert(MediaCodecs.alawExpand(0x2a) == -32256)
    assert(MediaCodecs.alawExpand(0xaa) == 32256)
    // sign-bit symmetry across the whole byte range, both laws
    for (b <- 0 until 256) {
      assert(MediaCodecs.mulawExpand(b ^ 0x80) == -MediaCodecs.mulawExpand(b))
      assert(MediaCodecs.alawExpand(b ^ 0x80) == -MediaCodecs.alawExpand(b))
    }
    // container roundtrip: fmt codes 6/7, 8-bit storage, expanded samples
    val data = Array.tabulate(101)(i => ((i * 37) % 256).toByte)
    for (aLaw <- Seq(true, false)) {
      val wav = MediaCodecs.encodeWavG711(8000, data, aLaw)
      val a = MediaCodecs.decodeWavPcm16(wav).get
      assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 8)
      val want = data.map(b => if (aLaw) MediaCodecs.alawExpand(b & 0xff)
        else MediaCodecs.mulawExpand(b & 0xff))
      assert(a.samples.map(_.toInt).toSeq == want.toSeq)
      // truncation still rejects; float format (3) still rejects
      assert(MediaCodecs.decodeWavPcm16(wav.take(30)).isEmpty)
    }
    // G.711 with a lying bits-per-sample field rejects
    val bad = MediaCodecs.encodeWavG711(8000, data, aLaw = true)
    bad(34) = 16
    assert(MediaCodecs.decodeWavPcm16(bad).isEmpty)
  }

  test("G.711 compression is the nearest-level inverse of the pinned expansion") {
    for ((compress, expand) <- Seq(
      (MediaCodecs.mulawCompress _, MediaCodecs.mulawExpand _),
      (MediaCodecs.alawCompress _, MediaCodecs.alawExpand _))) {
      // level-preserving: compressing any decodable level re-quantizes to
      // the SAME level (codes may alias — mu-law 0x7F and 0xFF both decode
      // to 0 — so the identity holds on values, not code bytes)
      for (b <- 0 until 256) {
        val lvl = expand(b)
        assert(expand(compress(lvl)) == lvl, s"code $b level $lvl")
      }
      // optimality spot-check on a full-range sweep: no code is strictly
      // closer than the chosen one
      for (x <- -32768 to 32767 by 257) {
        val chosen = math.abs(expand(compress(x)) - x)
        val best = (0 until 256).map(b => math.abs(expand(b) - x)).min
        assert(chosen == best, s"x=$x chosen=$chosen best=$best")
      }
    }
    // deterministic tie rule: 0 decodes from mu-law codes 127 AND 255; the
    // ascending scan must pick 127
    assert(MediaCodecs.mulawCompress(0) == 127)
  }

  test("IMA ADPCM decode replays the reference state machine exactly") {
    // Independent re-implementation of the public IMA update (coded here
    // from the spec, not calling the library's adpcmStep): the decoded
    // samples of a raw-codes block must match it value-for-value.
    def refStep(pred: Int, idx: Int, code: Int): (Int, Int) = {
      val st = MediaCodecs.AdpcmStepTable(idx)
      val mag = st / 8 + (if ((code & 1) != 0) st / 4 else 0) +
        (if ((code & 2) != 0) st / 2 else 0) + (if ((code & 4) != 0) st else 0)
      val p = pred + (if ((code & 8) != 0) -mag else mag)
      (math.max(-32768, math.min(32767, p)),
        math.max(0, math.min(88, idx + MediaCodecs.AdpcmIndexTable(code & 7))))
    }
    for (seed <- Seq(0, 37, 122, 199)) {
      val pred0 = seed * 9973 % 60000 - 30000
      val idx0 = seed % 89
      val codes = Array.tabulate(24)(j => (seed * 7 + j * 3) % 16)
      val wav = MediaCodecs.encodeWavAdpcmRaw(8000, pred0, idx0, codes, 16)
      val a = MediaCodecs.decodeWavPcm16(wav).get
      assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 4)
      var pred = pred0; var idx = idx0
      val want = pred0 +: codes.map { c =>
        val (p, i) = refStep(pred, idx, c); pred = p; idx = i; p
      }.toSeq
      assert(a.samples.map(_.toInt).toSeq == want, s"seed $seed")
    }
  }

  test("IMA ADPCM roundtrip: block headers exact, interior within step error") {
    val n = 505 // spans 3 blocks at blockAlign 128 (249 samples/block)
    val samples = Array.tabulate(n)(i =>
      (8000 * math.sin(i / 20.0) + 2000 * math.sin(i / 5.0)).toInt.toShort)
    val wav = MediaCodecs.encodeWavAdpcm(22050, samples, blockAlign = 128)
    val a = MediaCodecs.decodeWavPcm16(wav).get
    assert(a.sampleRate == 22050)
    val perBlock = 1 + (128 - 4) * 2
    // the fact chunk declares the TRUE count: the final block's code
    // padding is dropped, so decode length equals the input length
    assert(a.samples.length == n)
    // each block's first sample is stored verbatim in the header
    for (b <- 0 until 3)
      assert(a.samples(b * perBlock) == samples(b * perBlock))
    // 4-bit predictive coding tracks a smooth signal closely; the step
    // size needs a few samples to adapt up from index 0, so the attack
    // transient dominates the max error (authentic ADPCM behavior)
    val errs = samples.indices.map(i => math.abs(a.samples(i) - samples(i)))
    assert(errs.max < 4000, s"max err ${errs.max}")
    assert(errs.drop(40).max < 1200, s"post-attack err ${errs.drop(40).max}")
    val snr = samples.map(s => s.toDouble * s).sum /
      errs.map(e => e.toDouble * e).sum.max(1.0)
    assert(snr > 100.0, s"snr $snr") // > 20 dB
  }

  test("IMA ADPCM hostile inputs reject cleanly") {
    val good = MediaCodecs.encodeWavAdpcmRaw(8000, 10, 5,
      Array.fill(16)(3), 12)
    assert(MediaCodecs.decodeWavPcm16(good).isDefined)
    // wSamplesPerBlock inconsistent with blockAlign
    val badPer = good.clone(); badPer(38) = 99.toByte
    assert(MediaCodecs.decodeWavPcm16(badPer).isEmpty)
    // block header step index out of the 89-entry table (data at 60,
    // index byte is data+2)
    val badIdx = good.clone(); badIdx(62) = 120.toByte
    assert(MediaCodecs.decodeWavPcm16(badIdx).isEmpty)
    // fact chunk claiming more samples than the blocks hold
    val badFact = good.clone(); badFact(48) = 99.toByte
    assert(MediaCodecs.decodeWavPcm16(badFact).isEmpty)
    // data length not a whole number of blocks
    val badLen = good.clone()
    badLen(56) = (badLen(56) - 1).toByte // data chunk size 11
    assert(MediaCodecs.decodeWavPcm16(badLen.dropRight(1)).isEmpty)
    // truncation mid-data
    assert(MediaCodecs.decodeWavPcm16(good.take(50)).isEmpty)
    // encoder rejects out-of-contract args loudly
    intercept[IllegalArgumentException] {
      MediaCodecs.encodeWavAdpcmRaw(8000, 10, 5, Array.fill(15)(3), 12)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.encodeWavAdpcmRaw(8000, 10, 89, Array.fill(16)(3), 12)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.encodeWavAdpcm(8000, Array.emptyShortArray)
    }
  }

  test("STEREO IMA ADPCM: channels decode as two independent mono machines") {
    val n = 23 // spans 3 blocks at blockAlign 16 (9 frames/channel/block)
    val left = Array.tabulate(n)(i =>
      (7000 * math.sin(i / 7.0)).toInt.toShort)
    val right = Array.tabulate(n)(i =>
      (5000 * math.cos(i / 3.0) - 1500).toInt.toShort)
    val wav = MediaCodecs.encodeWavAdpcmStereo(22050, left, right, blockAlign = 16)
    val a = MediaCodecs.decodeWavPcm16(wav).get
    assert(a.sampleRate == 22050 && a.channels == 2 && a.bitsPerSample == 4)
    // fact truncation: n frames per channel, interleaved [L, R, L, R ...]
    assert(a.samples.length == 2 * n)
    // THE structural proof of the interleave: stereo blockAlign 16 gives
    // the same 9-frame/block schedule as mono blockAlign 8, so each
    // de-interleaved channel must equal its own INDEPENDENT mono decode —
    // any state leak between channels or swapped 4-byte group breaks this
    val evens = Array.tabulate(n)(j => a.samples(2 * j))
    val odds = Array.tabulate(n)(j => a.samples(2 * j + 1))
    val monoL = MediaCodecs.decodeWavPcm16(
      MediaCodecs.encodeWavAdpcm(22050, left, blockAlign = 8)).get.samples
    val monoR = MediaCodecs.decodeWavPcm16(
      MediaCodecs.encodeWavAdpcm(22050, right, blockAlign = 8)).get.samples
    assert(evens.sameElements(monoL))
    assert(odds.sameElements(monoR))
    // block headers: each block's first frame is verbatim per channel
    for (b <- 0 until 3) {
      assert(evens(b * 9) == left(b * 9))
      assert(odds(b * 9) == right(b * 9))
    }
  }

  test("stereo IMA ADPCM hostile inputs reject cleanly") {
    val l = Array.tabulate(10)(i => (i * 700).toShort)
    val r = Array.tabulate(10)(i => (i * -500).toShort)
    val good = MediaCodecs.encodeWavAdpcmStereo(8000, l, r, blockAlign = 16)
    assert(MediaCodecs.decodeWavPcm16(good).isDefined)
    // wSamplesPerBlock inconsistent with the stereo formula
    val badPer = good.clone(); badPer(38) = 25.toByte
    assert(MediaCodecs.decodeWavPcm16(badPer).isEmpty)
    // a blockAlign without whole per-channel 4-byte groups
    val badBa = good.clone(); badBa(32) = 20.toByte
    assert(MediaCodecs.decodeWavPcm16(badBa).isEmpty)
    // right-channel header index out of table range (data at 60, right
    // header at +4, its index byte at +6)
    val badIdx = good.clone(); badIdx(66) = 101.toByte
    assert(MediaCodecs.decodeWavPcm16(badIdx).isEmpty)
    // fact chunk claiming more frames than the blocks hold
    val badFact = good.clone(); badFact(48) = 99.toByte
    assert(MediaCodecs.decodeWavPcm16(badFact).isEmpty)
    // encoder contract: unequal channels, bad blockAlign, empty input
    intercept[IllegalArgumentException] {
      MediaCodecs.encodeWavAdpcmStereo(8000, l, r.take(9), 16)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.encodeWavAdpcmStereo(8000, l, r, 20)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.encodeWavAdpcmStereo(8000,
        Array.emptyShortArray, Array.emptyShortArray, 16)
    }
  }

  test("non-media payloads are rejected, so decodeFeatures yields explicit nulls") {
    val text = "BMthis is not a bitmap, just text starting with the magic".getBytes("UTF-8")
    assert(MediaCodecs.decodeBmp24(text).isEmpty) // size field check rejects
    assert(MediaCodecs.decodeWavPcm16(text).isEmpty)
    assert(Multimodal.realDecode(text).isEmpty)
  }

  test("probeContainers dispatches mp4/mpeg/wav in false-positive-safe " +
    "order and rejects text explicitly") {
    import spark.implicits._
    import graft.operators.{Mp4Boxes, MpegFrames, Multimodal}
    val mp4 = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 1200,
      Seq(Mp4Boxes.SynthTrack(1, "vide", "hvc1", 320, 240, 30000, 90000, "und")),
      8, _ => 3)
    val mpeg = MpegFrames.synthStream(3, 0, Seq((5, false), (5, false)),
      (_, _) => 77)
    val pcm = MediaCodecs.encodeWavPcm16(16000, Array.tabulate(32)(i => i.toShort))
    val g711 = MediaCodecs.encodeWavG711(8000,
      Array.tabulate(16)(i => (i * 7).toByte), aLaw = true)
    val adpcm = MediaCodecs.encodeWavAdpcmStereo(22050,
      Array.tabulate(10)(i => (i * 100).toShort),
      Array.tabulate(10)(i => (i * -50).toShort), blockAlign = 16)
    val junk = "just some text, no container here".getBytes("UTF-8")
    val rows = Seq(
      (1L, mp4), (2L, mpeg), (3L, pcm), (4L, g711), (5L, adpcm), (6L, junk)
    ).map { case (id, p) =>
      Multimodal.MediaRow(id, p, Multimodal.MediaMeta("x", p.length, 0L))
    }
    val out = Multimodal.probeContainers(rows.toDS()).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).container.contains("mp4") && out(1L).codec.contains("hvc1"))
    assert(out(1L).duration_ms.contains(1200L * 1000 / 600))
    assert(out(2L).container.contains("mpeg") && out(2L).codec.contains("mp3"))
    assert(out(2L).duration_ms.contains(2L * 1152 * 1000 / 44100))
    assert(out(3L).container.contains("wav") && out(3L).codec.contains("pcm16"))
    assert(out(3L).duration_ms.contains(32L * 1000 / 16000))
    assert(out(4L).codec.contains("g711"))
    assert(out(5L).codec.contains("adpcm") &&
      out(5L).duration_ms.contains(10L * 1000 / 22050)) // per-channel frames
    assert(out(6L).container.isEmpty && out(6L).duration_ms.isEmpty &&
      out(6L).codec.isEmpty && out(6L).payload_bytes == junk.length)
  }

  test("binaryFile ingest: real files on disk decode through the media pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("media_ingest")
    // real files in five formats with known content, one decoy text file
    java.nio.file.Files.write(dir.resolve("a.bmp"),
      MediaCodecs.encodeBmp24(5, 3, (_, y) => (10 + y, 20, 30)))
    java.nio.file.Files.write(dir.resolve("b.bmp"),
      MediaCodecs.encodeBmp24(9, 4, (_, y) => (50 + y, 60, 70)))
    java.nio.file.Files.write(dir.resolve("c.wav"),
      MediaCodecs.encodeWavPcm16(8000, Array[Short](5, -5, 7)))
    java.nio.file.Files.write(dir.resolve("d.png"),
      MediaCodecs.encodePng(7, 2, (x, y) => (x, y, x + y)))
    java.nio.file.Files.write(dir.resolve("e.jpg"),
      graft.operators.JpegCodec.encodeJpegFlat(16, 8, subsample420 = false,
        (bx, _) => 90 + bx))
    java.nio.file.Files.write(dir.resolve("readme.txt"),
      "not media at all".getBytes("UTF-8"))
    val media = Multimodal.readMediaDir(spark, dir.toString)
    val rows = media.collect()
    assert(rows.length == 6)
    assert(rows.map(_.meta.formatGuess).sorted.toSeq ==
      Seq("bmp", "bmp", "jpeg", "png", "unknown", "wav"))
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => (f.width, f.height, f.channels)).toSet
    // each real format reports its REAL header dims ((nSamples, 1,
    // channels) for the WAV); the text file surfaces as explicit nulls
    assert(feats.contains((Some(5), Some(3), Some(3))) &&
      feats.contains((Some(9), Some(4), Some(3))), feats)
    assert(feats.contains((Some(3), Some(1), Some(1))), feats)
    assert(feats.contains((Some(7), Some(2), Some(3))) &&
      feats.contains((Some(16), Some(8), Some(3))), feats)
    assert(feats.contains((None, None, None)), feats)
    // glob pushdown: only the bmps are even listed
    assert(Multimodal.readMediaDir(spark, dir.toString, "*.bmp").count() == 2)
  }

  test("truncated and corrupt headers return None, never throw") {
    val good = MediaCodecs.encodeBmp24(6, 4, (_, _) => (1, 2, 3))
    assert(MediaCodecs.decodeBmp24(good.slice(0, 40)).isEmpty)
    val badBpp = good.clone(); badBpp(28) = 8 // not 24-bit
    assert(MediaCodecs.decodeBmp24(badBpp).isEmpty)
    // hostile dimensions must be rejected BEFORE any allocation: height =
    // Int.MinValue (whose 32-bit abs is itself negative) and an overflowing
    // width both previously slipped past int-arithmetic bounds checks
    val minH = good.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(MediaCodecs.decodeBmp24(minH).isEmpty)
    val hugeW = good.clone()
    hugeW(18) = 0xff.toByte; hugeW(19) = 0xff.toByte
    hugeW(20) = 0xff.toByte; hugeW(21) = 0x7f.toByte
    assert(MediaCodecs.decodeBmp24(hugeW).isEmpty)
    // the PAIR (w=0x55555556, h=0x80000000) wraps w*|h|*3 past Long.Max to
    // a small value, sneaking through a product-form bound; the division
    // guard rejects it (and any Some here would carry a negative height)
    val wrapPair = good.clone()
    wrapPair(18) = 0x56.toByte; wrapPair(19) = 0x55.toByte
    wrapPair(20) = 0x55.toByte; wrapPair(21) = 0x55.toByte
    wrapPair(22) = 0; wrapPair(23) = 0; wrapPair(24) = 0
    wrapPair(25) = 0x80.toByte
    assert(MediaCodecs.decodeBmp24(wrapPair).isEmpty)
    val wav = MediaCodecs.encodeWavPcm16(8000, Array[Short](1, 2))
    assert(MediaCodecs.decodeWavPcm16(wav.slice(0, 20)).isEmpty)
    val badFmt = wav.clone(); badFmt(20) = 3 // not PCM
    assert(MediaCodecs.decodeWavPcm16(badFmt).isEmpty)
  }

  test("ppm roundtrip recovers pixels; header comments and whitespace are skipped") {
    for (w <- Seq(1, 5, 13); h <- Seq(1, 4, 9)) {
      val enc = MediaCodecs.encodePpm6(w, h, (x, y) => (x + y, 2 * x, 3 * y))
      assert(enc.length == MediaCodecs.ppmFileSize(w, h))
      val img = MediaCodecs.decodePpm6(enc).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == ((x + y, 2 * x, 3 * y)), s"($x,$y)")
    }
    // hand-built header: multiple comments, CRLF, tabs between tokens
    val raster = Array.tabulate[Byte](6)(i => (10 + i).toByte)
    val weird = ("P6 # trailing comment\n#another\n\t 2\r\n# mid\n 1 \t255\n"
      .getBytes("US-ASCII")) ++ raster
    val img = MediaCodecs.decodePpm6(weird).get
    assert(img.width == 2 && img.height == 1)
    assert(img.pixels.toSeq == Seq((10, 11, 12), (13, 14, 15)))
  }

  test("ppm decoder rejects truncation, 2-byte maxval, and hostile dims — never throws") {
    val good = MediaCodecs.encodePpm6(4, 3, (_, _) => (1, 2, 3))
    assert(MediaCodecs.decodePpm6(good.dropRight(1)).isEmpty) // short raster
    assert(MediaCodecs.decodePpm6(good.take(8)).isEmpty) // header only
    val deep = "P6\n4 3\n65535\n".getBytes("US-ASCII") ++ good.drop(15)
    assert(MediaCodecs.decodePpm6(deep).isEmpty) // 2-byte samples unsupported
    val negish = "P6\n4294967295 4294967295\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](32)(0)
    assert(MediaCodecs.decodePpm6(negish).isEmpty) // dims past the byte budget
    assert(MediaCodecs.decodePpm6("P6\n0 5\n255\n ".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.decodePpm6(Array[Byte]('P', '5')).isEmpty) // not P6
    // a comment that swallows the would-be raster separator is truncation
    assert(MediaCodecs.decodePpm6("P6\n2 1\n255# no newline".getBytes("US-ASCII")).isEmpty)
    // a zero-padded oversized width must parse as ONE over-limit token and
    // be rejected — not split into two tokens that mimic a tiny valid image
    val padded = "P6\n0000000000000000012 3\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](16)(7)
    assert(MediaCodecs.decodePpm6(padded).isEmpty)
  }

  test("no fixture document text sniffs as real media (q50's null-path assumption)") {
    // q50's oracle NULLs the decode columns for raw-text payloads,
    // assuming no text parses as BMP/PPM/PGM/PBM/WAV. Each magic
    // added to realDecode narrows that margin ('P4 20 9 ...' is almost
    // prose), so the assumption is CHECKED here against the corpus: if the
    // driver ever regenerates documents whose text decodes, this fails
    // before the gate silently diverges.
    val texts = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    val decodable = texts.filter(t =>
      Multimodal.realDecode(t.getBytes("UTF-8")).isDefined)
    assert(decodable.isEmpty,
      s"document text parses as real media: ${decodable.take(3).mkString(" | ")}")
  }

  test("pbm roundtrip recovers bits across byte-boundary widths; 1 = black") {
    for (w <- Seq(1, 7, 8, 9, 17); h <- Seq(1, 3)) {
      val pat = (x: Int, y: Int) => (x + y) % 3 == 0
      val enc = MediaCodecs.encodePbm4(w, h, pat)
      val img = MediaCodecs.decodePbm4(enc).get
      assert(img.width == w && img.height == h, s"${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val want = if (pat(x, y)) (0, 0, 0) else (255, 255, 255)
        assert(img.pixels(y * w + x) == want, s"($x,$y) of ${w}x$h")
      }
    }
    // a hostile header can declare ~8x more pixels than payload bytes
    // (packed bits): 2^25 x 1 satisfies the BYTE budget with a 4 MiB
    // raster but must be rejected by the MaxPbmPixels allocation bound —
    // without it, a ~270 MB payload could force Int.MaxValue boxed tuples
    val wide = s"P4\n${1 << 25} 1\n".getBytes("US-ASCII") ++
      Array.fill[Byte]((1 << 22) + 8)(0)
    assert(MediaCodecs.decodePbm4(wide).isEmpty)
    // encoder moves with the decoder budget: encodable => decodable
    assert(intercept[IllegalArgumentException](
      MediaCodecs.encodePbm4(1 << 25, 1, (_, _) => false))
      .getMessage.contains("P4 pixel budget"))
    // truncation and cross-magic rejection
    val good = MediaCodecs.encodePbm4(9, 2, (_, _) => true)
    assert(MediaCodecs.decodePbm4(good.dropRight(1)).isEmpty)
    assert(MediaCodecs.decodePgm5(good).isEmpty)
    assert(MediaCodecs.decodePbm4(
      MediaCodecs.encodePgm5(2, 2, (_, _) => 9)).isEmpty)
  }

  test("png roundtrip recovers pixels across all five filter types and three color types") {
    for (w <- Seq(1, 3, 5, 8); h <- Seq(1, 2, 7)) {
      val pat = (x: Int, y: Int) =>
        ((x * 7 + y * 13) % 256, (x * 3 + y) % 256, (x + y * 29) % 256)
      // filterOf = _ % 5 walks None/Sub/Up/Average/Paeth — every unfilter
      // path participates whenever h > 4, and Sub/Average/Paeth see the
      // x < bpp left-edge case at every width
      val enc = MediaCodecs.encodePng(w, h, pat, filterOf = _ % 5)
      val img = MediaCodecs.decodePng(enc).get
      assert(img.width == w && img.height == h, s"${w}x$h")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == pat(x, y), s"($x,$y) of ${w}x$h")
    }
    // gray widens to r = g = b; RGBA's alpha drops — the shared container
    val g = MediaCodecs.decodePng(
      MediaCodecs.encodePngGray(4, 3, (x, y) => (10 * y + x) % 256, _ % 5)).get
    for (y <- 0 until 3; x <- 0 until 4)
      assert(g.pixels(y * 4 + x) == ((10 * y + x, 10 * y + x, 10 * y + x)))
    val ra = MediaCodecs.decodePng(
      MediaCodecs.encodePngRgba(3, 2, (x, y) => (x, y, x + y, 128), _ % 5)).get
    for (y <- 0 until 2; x <- 0 until 3)
      assert(ra.pixels(y * 3 + x) == ((x, y, x + y)))
  }

  test("png decoder rejects corruption, truncation, bad filters, hostile dims — never throws") {
    val good = MediaCodecs.encodePng(5, 4, (x, y) => (x, y, x + y))
    assert(MediaCodecs.decodePng(good).isDefined)
    // one flipped byte inside IDAT data: the chunk CRC catches it
    val flipped = good.clone()
    flipped(43) = (flipped(43) ^ 0x41).toByte
    assert(MediaCodecs.decodePng(flipped).isEmpty)
    // truncation mid-chunk: framing bounds fail before any allocation
    assert(MediaCodecs.decodePng(good.dropRight(15)).isEmpty)
    assert(MediaCodecs.decodePng(good.take(20)).isEmpty)
    // hostile streams with VALID chunk framing, one broken invariant each
    val sig = good.take(8)
    val ihdr = good.slice(8, 33) // the whole valid IHDR chunk
    val iend = MediaCodecs.pngChunk("IEND", Array.emptyByteArray)
    val rawLen = (1 + 3 * 5) * 4
    val zeroRaw = new Array[Byte](rawLen) // filter 0 rows, black pixels
    def png(idatData: Array[Byte], hdr: Array[Byte] = ihdr) =
      sig ++ hdr ++ MediaCodecs.pngChunk("IDAT", idatData) ++ iend
    assert(MediaCodecs.decodePng(png(MediaCodecs.pngDeflate(zeroRaw))).isDefined)
    // zlib stream cut short of the declared raster
    assert(MediaCodecs.decodePng(
      png(MediaCodecs.pngDeflate(zeroRaw).dropRight(4))).isEmpty)
    // stream decompressing PAST the declared raster
    assert(MediaCodecs.decodePng(
      png(MediaCodecs.pngDeflate(new Array[Byte](rawLen + 5)))).isEmpty)
    // filter byte outside 0..4
    val badFilter = zeroRaw.clone(); badFilter(0) = 9
    assert(MediaCodecs.decodePng(png(MediaCodecs.pngDeflate(badFilter))).isEmpty)
    // hostile dims: 32768 x 32768 = 2^30 pixels blows the MaxPngPixels cap
    // (a few-KB deflate payload could otherwise force a multi-GB pixel
    // array — compression hides the raster size from payload bounds)
    val bigDims = Array[Byte](0, 0, 0x40, 0, 0, 0, 0x40, 0, 8, 2, 0, 0, 0)
    val big = Array[Byte](0, 0, -128, 0, 0, 0, -128, 0, 8, 2, 0, 0, 0)
    assert(MediaCodecs.decodePng(png(MediaCodecs.pngDeflate(zeroRaw),
      MediaCodecs.pngChunk("IHDR", big))).isEmpty)
    // 16-bit depth, palette-without-PLTE, and Adam7 interlace all fall back
    for (i <- Seq(8, 9, 12)) {
      val hdr = ihdr.slice(8, 21) // the 13 IHDR data bytes
      hdr(i) = (i match { case 8 => 16; case 9 => 3; case _ => 1 }).toByte
      assert(MediaCodecs.decodePng(png(MediaCodecs.pngDeflate(zeroRaw),
        MediaCodecs.pngChunk("IHDR", hdr))).isEmpty, s"ihdr byte $i")
    }
    // bigDims (2^14 square = 2^28 > cap) also rejected
    assert(MediaCodecs.decodePng(png(MediaCodecs.pngDeflate(zeroRaw),
      MediaCodecs.pngChunk("IHDR", bigDims))).isEmpty)
  }

  test("palette png roundtrip looks pixels up in PLTE across all filter types") {
    val pal = Array((10, 20, 30), (200, 100, 50), (0, 255, 7))
    for (w <- Seq(1, 5); h <- Seq(1, 7)) {
      val enc = MediaCodecs.encodePngPalette(w, h, pal, (x, y) => (x + y) % 3, _ % 5)
      val img = MediaCodecs.decodePng(enc).get
      assert(img.width == w && img.height == h, s"${w}x$h")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == pal((x + y) % 3), s"($x,$y) of ${w}x$h")
    }
    // 1-entry and 256-entry palettes are both legal extremes
    val one = MediaCodecs.decodePng(
      MediaCodecs.encodePngPalette(2, 2, Array((9, 8, 7)), (_, _) => 0)).get
    assert(one.pixels.forall(_ == ((9, 8, 7))))
    val full = Array.tabulate(256)(i => (i, 255 - i, (i * 3) % 256))
    val fimg = MediaCodecs.decodePng(
      MediaCodecs.encodePngPalette(16, 16, full, (x, y) => 16 * y + x)).get
    for (y <- 0 until 16; x <- 0 until 16)
      assert(fimg.pixels(y * 16 + x) == full(16 * y + x))
    intercept[IllegalArgumentException] {
      MediaCodecs.encodePngPalette(2, 2, Array.empty, (_, _) => 0)
    }
  }

  test("16-bit, gray+alpha, and Adam7-interlaced PNGs roundtrip") {
    // 16-bit RGB: big-endian samples, high byte IS the 16->8 downscale —
    // low bytes chosen nonzero so an endianness swap lands in the assert
    val rgb16 = MediaCodecs.decodePng(MediaCodecs.encodePng16(5, 4,
      (x, y) => ((x << 8) | 123, ((10 + y) << 8) | 7, ((x + y) << 8) | 255),
      _ % 5)).get
    assert(rgb16.width == 5 && rgb16.height == 4)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(rgb16.pixels(y * 5 + x) == ((x, 10 + y, x + y)), s"($x,$y)")
    // 16-bit gray widens to r = g = b
    val g16 = MediaCodecs.decodePng(MediaCodecs.encodePngGray16(3, 3,
      (x, y) => ((7 * x + y) << 8) | 200, _ % 5)).get
    for (y <- 0 until 3; x <- 0 until 3)
      assert(g16.pixels(y * 3 + x) == ((7 * x + y, 7 * x + y, 7 * x + y)))
    // gray+alpha (type 4): gray widens, alpha drops; PLTE on type 4 rejects
    val ga = MediaCodecs.decodePng(MediaCodecs.encodePngGrayAlpha(4, 2,
      (x, y) => (40 + x + 3 * y, 17 * x), _ % 5)).get
    for (y <- 0 until 2; x <- 0 until 4)
      assert(ga.pixels(y * 4 + x) == ((40 + x + 3 * y, 40 + x + 3 * y, 40 + x + 3 * y)))
    // Adam7: every pixel of every pass lands at its logical position —
    // 13x11 exercises partial passes, 1x1 exercises five EMPTY passes
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8), (13, 11))) {
      val pat = (x: Int, y: Int) =>
        ((x * 7 + y * 13) % 256, (x * 3 + y) % 256, (x + y * 29) % 256)
      val img = MediaCodecs.decodePng(MediaCodecs.encodePngAdam7(w, h, pat, _ % 5)).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == pat(x, y), s"($x,$y) of ${w}x$h interlaced")
    }
    // the interlaced stream is NOT the straight raster: flipping the IHDR
    // interlace flag back to 0 must reject (raster length mismatch)
    val adam = MediaCodecs.encodePngAdam7(8, 8, (x, y) => (x, y, x + y))
    val flat = adam.clone()
    flat(8 + 8 + 12) = 0 // IHDR data byte 12 (interlace), at sig+len+type+12
    // ... with the chunk CRC refreshed so ONLY the semantic check can fire
    val ihdrData = java.util.Arrays.copyOfRange(flat, 16, 29)
    val fixed = flat.take(8) ++ MediaCodecs.pngChunk("IHDR", ihdrData) ++ flat.drop(33)
    assert(MediaCodecs.decodePng(fixed).isEmpty)
  }

  test("16-bit Adam7 PNG (combined depth + interlace) decodes by high byte") {
    // no encoder emits this combination, so build the stream by hand:
    // per-pass filter-0 rasters of big-endian 16-bit RGB samples with
    // nonzero low bytes, assembled as depth=16 interlace=1
    val w = 5; val h = 5
    val pix = (x: Int, y: Int) =>
      (((10 * x + y) << 8) | 77, ((x + 10 * y) << 8) | 99, ((40 + x * y) << 8) | 1)
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val raw = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- passes) {
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) for (py <- 0 until ph) {
        raw.write(0) // filter None
        for (px <- 0 until pw) {
          val (r, g, b) = pix(x0 + px * dx, y0 + py * dy)
          Seq(r, g, b).foreach { v => raw.write(v >> 8); raw.write(v & 0xff) }
        }
      }
    }
    val png = MediaCodecs.pngAssemble(w, h, 2, raw.toByteArray,
      depth = 16, interlace = 1)
    val img = MediaCodecs.decodePng(png).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      assert(img.pixels(y * w + x) == ((r >> 8, g >> 8, b >> 8)), s"($x,$y)")
    }
  }

  test("palette png: PLTE ordering, length, and index-range violations all reject") {
    val plteBytes = Array((1, 2, 3), (4, 5, 6), (7, 8, 9))
      .flatMap { case (r, g, b) => Array(r.toByte, g.toByte, b.toByte) }
    val w = 4; val h = 2
    val raw = new Array[Byte]((1 + w) * h) // filter-0 rows, all index 0
    val okPng = MediaCodecs.pngAssemble(w, h, 3, raw, plteBytes)
    assert(MediaCodecs.decodePng(okPng).exists(_.pixels.forall(_ == ((1, 2, 3)))))
    // an index byte past the 3-entry palette: valid framing, corrupt data
    val badIdx = raw.clone(); badIdx(2) = 3
    assert(MediaCodecs.decodePng(
      MediaCodecs.pngAssemble(w, h, 3, badIdx, plteBytes)).isEmpty)
    // type 3 with no PLTE at all
    assert(MediaCodecs.decodePng(MediaCodecs.pngAssemble(w, h, 3, raw)).isEmpty)
    // hand-ordered chunk streams, one violation each
    val sig = okPng.take(8)
    val ihdrChunk = okPng.slice(8, 33)
    val idat = MediaCodecs.pngChunk("IDAT", MediaCodecs.pngDeflate(raw))
    val plteChunk = MediaCodecs.pngChunk("PLTE", plteBytes)
    val iend = MediaCodecs.pngChunk("IEND", Array.emptyByteArray)
    // PLTE after the first IDAT (spec: must precede it)
    assert(MediaCodecs.decodePng(sig ++ ihdrChunk ++ idat ++ plteChunk ++ iend).isEmpty)
    // duplicate PLTE
    assert(MediaCodecs.decodePng(
      sig ++ ihdrChunk ++ plteChunk ++ plteChunk ++ idat ++ iend).isEmpty)
    // length not a multiple of 3; oversized (> 256 entries)
    assert(MediaCodecs.decodePng(sig ++ ihdrChunk ++
      MediaCodecs.pngChunk("PLTE", Array[Byte](1, 2)) ++ idat ++ iend).isEmpty)
    assert(MediaCodecs.decodePng(sig ++ ihdrChunk ++
      MediaCodecs.pngChunk("PLTE", new Array[Byte](771)) ++ idat ++ iend).isEmpty)
    // PLTE on a grayscale image is spec-forbidden
    val gray = MediaCodecs.encodePngGray(2, 2, (_, _) => 0)
    assert(MediaCodecs.decodePng(
      gray.take(8) ++ gray.slice(8, 33) ++ plteChunk ++ gray.drop(33)).isEmpty)
  }

  test("single-byte corruption sweep: no 1-byte flip in any format makes decode throw") {
    // exhaustive deterministic fuzz: every byte of every codec's output,
    // two xor masks each — the never-throw contract tested wholesale
    // instead of by curated hostile fixtures
    val files: Seq[(String, Array[Byte])] = Seq(
      "png" -> MediaCodecs.encodePng(5, 4, (x, y) => (x, y, x + y), _ % 5),
      "png16" -> MediaCodecs.encodePng16(4, 3, (x, y) => (x << 9, y << 9, 999), _ % 5),
      "adam7" -> MediaCodecs.encodePngAdam7(9, 9, (x, y) => (x, y, x + y), _ % 5),
      "palette" -> MediaCodecs.encodePngPalette(5, 4,
        Array((1, 2, 3), (4, 5, 6)), (x, y) => (x + y) % 2, _ % 5),
      "grayalpha" -> MediaCodecs.encodePngGrayAlpha(4, 3, (x, y) => (x + y, 200)),
      "bmp" -> MediaCodecs.encodeBmp24(5, 3, (x, y) => (x, y, 9)),
      "ppm" -> MediaCodecs.encodePpm6(4, 3, (x, y) => (x, y, 7)),
      "pgm" -> MediaCodecs.encodePgm5(4, 3, (x, y) => x + y),
      "pbm" -> MediaCodecs.encodePbm4(9, 3, (x, y) => (x + y) % 2 == 0),
      "wav" -> MediaCodecs.encodeWavPcm16(8000, Array[Short](5, -5, 700, -700)),
      "g711u" -> MediaCodecs.encodeWavG711(8000,
        Array.tabulate(16)(i => (i * 17).toByte), aLaw = false),
      "g711a" -> MediaCodecs.encodeWavG711(8000,
        Array.tabulate(16)(i => (i * 17).toByte), aLaw = true))
    for ((name, f) <- files; i <- f.indices; m <- Seq(0xff, 0x01)) {
      val bad = f.clone()
      bad(i) = (bad(i) ^ m).toByte
      try {
        MediaCodecs.decodePng(bad); MediaCodecs.decodeBmp24(bad)
        MediaCodecs.decodePpm6(bad); MediaCodecs.decodePgm5(bad)
        MediaCodecs.decodePbm4(bad); MediaCodecs.decodeWavPcm16(bad)
      } catch {
        case e: Throwable => fail(s"$name byte $i mask $m threw: $e")
      }
    }
  }

  test("dHash64: horizontal-gradient bits from block SUMS, bit order pinned") {
    // 4x2 image, 1x1 blocks -> 4x2 grid, (4-1)*2 = 6 bits.
    // row 0: 10 20 5 5  -> bits (bx=0)=1 (20>10), (bx=1)=0 (5>20 no), (bx=2)=0
    // row 1: 7 7 8 1    -> bits (bx=0)=0, (bx=1)=1 (8>7), (bx=2)=0
    val vals = Array(Array(10, 20, 5, 5), Array(7, 7, 8, 1))
    val img = MediaCodecs.BmpImage(4, 2,
      Array.tabulate(8)(i => { val v = vals(i / 4)(i % 4); (v, v, v) }))
    // bit index = by * (gw-1) + bx
    assert(MediaCodecs.dHash64(img, 1, 1) == ((1L << 0) | (1L << 4)))
    // 2x2 blocks: SUM semantics, not the top-left pixel — block (0,0) sums
    // 10+20+7+7=44, block (1,0) sums 5+5+8+1=19 -> single bit 0 (19>44 no)
    assert(MediaCodecs.dHash64(img, 2, 2) == 0L)
    val img2 = MediaCodecs.BmpImage(4, 2,
      Array.tabulate(8)(i => { val v = if (i % 4 >= 2) 50 else 1; (v, v, v) }))
    assert(MediaCodecs.dHash64(img2, 2, 2) == 1L) // right block brighter
    // tiling and bit-budget contracts
    intercept[IllegalArgumentException](MediaCodecs.dHash64(img, 3, 1))
    intercept[IllegalArgumentException](MediaCodecs.dHash64(img, 4, 1)) // gw=1
  }

  test("banded64Pairs: pigeonhole recall at radius <= 3, cross-band splits") {
    import spark.implicits._
    import graft.operators.Dedup
    val base = 0x0123456789abcdefL
    val rows = Seq(
      (0L, base),
      (1L, base),                               // ham 0
      (2L, base ^ 1L),                          // ham 1 (band 0)
      (3L, base ^ (1L << 15) ^ (1L << 16)),     // ham 2, straddles bands 0/1
      (4L, base ^ (1L << 0) ^ (1L << 31) ^ (1L << 63)), // ham 3, three bands
      (5L, base ^ 0xfL))                        // ham 4 -> excluded at max 3
    val pairs = Dedup.banded64Pairs(rows.toDF("doc_id", "sim64"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((0L, 1L, 0)))
    assert(pairs.contains((0L, 2L, 1)))
    assert(pairs.contains((0L, 3L, 2)))
    assert(pairs.contains((0L, 4L, 3))) // 3 bits in 3 bands: 4th band intact
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L && p._3 > 3))
    assert(pairs.forall(_._3 <= 3))
    intercept[IllegalArgumentException](
      Dedup.banded64Pairs(rows.toDF("doc_id", "sim64"), maxHamming = 4))
  }

  test("pgm roundtrip widens gray to RGB; P5/P6 magics don't cross-decode") {
    val enc = MediaCodecs.encodePgm5(3, 2, (x, y) => 10 * y + x)
    val img = MediaCodecs.decodePgm5(enc).get
    assert(img.width == 3 && img.height == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(img.pixels(y * 3 + x) == ((10 * y + x, 10 * y + x, 10 * y + x)))
    assert(MediaCodecs.decodePpm6(enc).isEmpty) // P5 payload is not a P6
    val ppm = MediaCodecs.encodePpm6(2, 2, (_, _) => (1, 2, 3))
    assert(MediaCodecs.decodePgm5(ppm).isEmpty) // and vice versa
    assert(MediaCodecs.decodePgm5(enc.dropRight(1)).isEmpty) // short raster
  }
}
