package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mp4Boxes
import graft.operators.Mp4Boxes.SynthTrack

/** ISO-BMFF probe: wire-format round-trips for both fullbox versions and
  * all three size forms, plus the hostile-byte sweep (every malformation
  * must yield None, never a throw or a wrong answer).
  */
class Mp4BoxesSpec extends AnyFunSuite {

  private val vTrack = SynthTrack(1, "vide", "avc1", 640, 360, 30000, 90000, "eng")
  private val aTrack = SynthTrack(2, "soun", "mp4a", 0, 0, 48000, 144000, "deu")

  private def synth(version1: Boolean = false, mdatLen: Int = 32) =
    Mp4Boxes.synthMp4("isom", 512, Seq("isom", "mp41"), 600, 6000,
      Seq(vTrack, aTrack), mdatLen, i => i * 7 + 3, version1 = version1)

  test("version-0 round trip: brands, movie clock, tracks, dims, language, mdat") {
    val b = synth()
    val info = Mp4Boxes.probe(b).get
    assert(info.brand == "isom" && info.minorVersion == 512)
    assert(info.compatibleBrands == Vector("isom", "mp41"))
    assert(info.timescale == 600 && info.duration == 6000)
    assert(info.durationMs == 10000)
    assert(info.nTracks == 2)
    val Vector(t1, t2) = info.tracks
    assert(t1.trackId == 1 && t1.handler == "vide" && t1.codecs == Vector("avc1"))
    assert(t1.width == 640 && t1.height == 360)
    assert(t1.timescale == 30000 && t1.duration == 90000 && t1.durationMs == 3000)
    assert(t1.lang == "eng")
    assert(t2.trackId == 2 && t2.handler == "soun" && t2.codecs == Vector("mp4a"))
    assert(t2.width == 0 && t2.height == 0 && t2.lang == "deu")
    assert(info.mdatBytes == 32)
    // closed-form size arithmetic (the oracle's file_bytes formula):
    // ftyp 16+4*2, moov 8 + mvhd 108 + 2 traks of 221, mdat 8+32
    assert(b.length == (16 + 8) + (8 + 108 + 2 * 221) + 40)
  }

  test("version-1 (64-bit) forms parse at their widened offsets") {
    val b = synth(version1 = true)
    val info = Mp4Boxes.probe(b).get
    assert(info.timescale == 600 && info.duration == 6000)
    val t1 = info.tracks.head
    assert(t1.trackId == 1 && t1.width == 640 && t1.height == 360 && t1.lang == "eng")
    assert(b.length == (16 + 8) + (8 + 120 + 2 * 245) + 40)
  }

  test("largesize (size == 1) and to-end (size == 0) mdat forms") {
    val b = synth()
    val mdatOff = b.length - 40 // mdat is last: 8-byte header + 32 payload
    assert(new String(b.slice(mdatOff + 4, mdatOff + 8), "US-ASCII") == "mdat")
    // rebuild the mdat as a largesize box: u32(1) + 'mdat' + u64(48) + payload
    val payload = b.slice(mdatOff + 8, b.length)
    val big = b.slice(0, mdatOff) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 48) ++ payload
    val infoBig = Mp4Boxes.probe(big).get
    assert(infoBig.mdatBytes == 32 && infoBig.nTracks == 2)
    // size == 0: extends to end of file (legal only at top level)
    val toEnd = b.clone()
    toEnd(mdatOff) = 0; toEnd(mdatOff + 1) = 0
    toEnd(mdatOff + 2) = 0; toEnd(mdatOff + 3) = 0
    assert(Mp4Boxes.probe(toEnd).get.mdatBytes == 32)
    // ... but a NESTED size == 0 (first moov child = mvhd) is malformed
    val nested = b.clone()
    val moovOff = 24 // after the 24-byte ftyp
    assert(new String(nested.slice(moovOff + 4, moovOff + 8), "US-ASCII") == "moov")
    val mvhdOff = moovOff + 8
    nested(mvhdOff) = 0; nested(mvhdOff + 1) = 0
    nested(mvhdOff + 2) = 0; nested(mvhdOff + 3) = 0
    assert(Mp4Boxes.probe(nested).isEmpty)
  }

  test("unknown boxes are skipped structurally, not fatally") {
    val b = synth()
    val mdatOff = b.length - 40
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val withFree = b.slice(0, mdatOff) ++ free ++ b.slice(mdatOff, b.length)
    val info = Mp4Boxes.probe(withFree).get
    assert(info.nTracks == 2 && info.mdatBytes == 32)
  }

  test("hostile bytes: every malformation yields None, never a throw") {
    val b = synth()
    // empty / tiny inputs
    assert(Mp4Boxes.probe(Array.emptyByteArray).isEmpty)
    assert(Mp4Boxes.probe(Array[Byte](0, 0, 0, 9)).isEmpty)
    // truncation anywhere: strict tiling must reject every cut
    Seq(1, 7, 24, 100, b.length - 1).foreach { cut =>
      assert(Mp4Boxes.probe(b.slice(0, b.length - cut)).isEmpty,
        s"cut of $cut bytes must not parse")
    }
    // a box size below the header length
    val small = b.clone(); small(3) = 7 // ftyp size 24 -> 7
    assert(Mp4Boxes.probe(small).isEmpty)
    // ftyp missing entirely (file starts at moov)
    assert(Mp4Boxes.probe(b.slice(24, b.length)).isEmpty)
    // ftyp present but not first
    val swapped = b.slice(24, b.length - 40) ++ b.slice(0, 24) ++
      b.slice(b.length - 40, b.length)
    assert(Mp4Boxes.probe(swapped).isEmpty)
    // a second moov
    val moov = b.slice(24, b.length - 40)
    assert(Mp4Boxes.probe(b ++ moov).isEmpty)
    // reserved fullbox version in mvhd (version 2)
    val badVer = b.clone(); badVer(24 + 8 + 8) = 2
    assert(Mp4Boxes.probe(badVer).isEmpty)
    // stsd entry count lies (declared 2, one entry present): find the
    // stsd of the first track and patch its entry_count
    val stsdMagic = "stsd".getBytes("US-ASCII")
    val stsdOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(stsdMagic)).get - 4
    val lying = b.clone(); lying(stsdOff + 8 + 4 + 3) = 2
    assert(Mp4Boxes.probe(lying).isEmpty)
    // trailing garbage after the last box (not a parseable box)
    assert(Mp4Boxes.probe(b ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("sample tables (stts/stsz/stco) round trip, uniform and per-sample") {
    val vt = vTrack.copy(
      sttsEntries = Seq((3L, 100L), (2L, 250L)), // 5 samples, 800 ticks
      sizes = Some(Right(Seq(10L, 20L, 30L, 40L, 50L))),
      chunks = 3)
    val at = aTrack.copy(
      sttsEntries = Seq((4L, 1024L)),
      sizes = Some(Left(512L)),
      chunks = 2)
    val b = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 800,
      Seq(vt, at), 16, _ => 7)
    val info = Mp4Boxes.probe(b).get
    val Some(s1) = info.tracks(0).samples
    assert(s1.sampleCount == 5 && s1.sttsDuration == 3 * 100 + 2 * 250)
    assert(s1.totalSampleBytes == 150 && s1.uniformSize.isEmpty)
    assert(s1.chunkCount == 3)
    val Some(s2) = info.tracks(1).samples
    assert(s2.sampleCount == 4 && s2.sttsDuration == 4096)
    assert(s2.totalSampleBytes == 2048 && s2.uniformSize.contains(512L))
    assert(s2.chunkCount == 2)
    // closed-form size: ftyp 20 + moov(8 + 108 + trak1 + trak2) + mdat 24
    // trak = 221 + stts(16+8e) + stsz + stco(16+4c)
    val trak1 = 221 + (16 + 8 * 2) + (20 + 4 * 5) + (16 + 4 * 3)
    val trak2 = 221 + (16 + 8 * 1) + 20 + (16 + 4 * 2)
    assert(b.length == 20 + (8 + 108 + trak1 + trak2) + 24)
    // INCONSISTENT tables reject: stsz declaring a count the stts sum
    // does not match (patch the stsz sample_count field)
    val stszMagic = "stsz".getBytes("US-ASCII")
    val zOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(stszMagic)).get - 4
    val lying = b.clone(); lying(zOff + 8 + 4 + 4 + 3) = 9
    assert(Mp4Boxes.probe(lying).isEmpty)
    // PARTIAL tables reject: stco retyped to an unknown box leaves
    // stts+stsz without their chunk table
    val stcoMagic = "stco".getBytes("US-ASCII")
    val cOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(stcoMagic)).get
    val partial = b.clone()
    Array[Byte]('f', 'r', 'e', 'e').zipWithIndex.foreach {
      case (ch, i) => partial(cOff + i) = ch
    }
    assert(Mp4Boxes.probe(partial).isEmpty)
  }

  test("stss sync samples and co64 64-bit chunk offsets round trip") {
    val vt = vTrack.copy(
      sttsEntries = Seq((9L, 100L)), // 9 samples
      sizes = Some(Left(64L)),
      chunks = 3, useCo64 = true,
      syncSamples = Seq(1L, 4L, 9L))
    val b = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 900,
      Seq(vt), 8, _ => 3)
    val info = Mp4Boxes.probe(b).get
    val Some(s) = info.tracks(0).samples
    assert(s.co64 && s.chunkCount == 3)
    // offsets (5<<32)+1000+16i: the high word must survive the decode
    assert(s.chunkOffsetSum == 3 * (5L << 32) + 3 * 1000 + 16 * (0 + 1 + 2))
    val Some(sync) = s.sync
    assert(sync == Mp4Boxes.SyncSummary(3, 1, 9, 5)) // gaps 3 and 5
    // stco keeps 32-bit sums and reports co64=false
    val b2 = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 900,
      Seq(vt.copy(useCo64 = false, syncSamples = Nil)), 8, _ => 3)
    val Some(s2) = Mp4Boxes.probe(b2).get.tracks(0).samples
    assert(!s2.co64 && s2.sync.isEmpty)
    assert(s2.chunkOffsetSum == 3 * 1000 + 16 * 3)
    // entries sit at sOff+16 (1), +20 (4), +24 (9)
    val stssMagic = "stss".getBytes("US-ASCII")
    val sOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(stssMagic)).get - 4
    // non-increasing sync numbers reject (entry 1: 4 -> 1)
    val bad = b.clone(); bad(sOff + 20 + 3) = 1
    assert(Mp4Boxes.probe(bad).isEmpty)
    // a sync number beyond the sample count rejects (entry 2: 9 -> 10)
    val over = b.clone(); over(sOff + 24 + 3) = 10
    assert(Mp4Boxes.probe(over).isEmpty)
    // stco AND co64 together reject: retype the co64 to stco is not
    // enough (sizes differ) — instead append a second minimal stco by
    // retagging stss (same 8+4n shape) to stco
    val both = b.clone()
    "stco".getBytes("US-ASCII").zipWithIndex.foreach { case (ch, i) =>
      both(sOff + 4 + i) = ch }
    assert(Mp4Boxes.probe(both).isEmpty)
  }

  test("stsc sample-to-chunk runs: implied total must match stts") {
    // 10 samples over 4 chunks: chunks 1-2 carry 3 each, chunks 3-4 carry 2
    val vt = vTrack.copy(
      sttsEntries = Seq((10L, 100L)),
      sizes = Some(Left(32L)),
      chunks = 4,
      stscRuns = Seq((1L, 3L), (3L, 2L)))
    val b = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 1000,
      Seq(vt), 8, _ => 5)
    val st = Mp4Boxes.probe(b).get.tracks.head.samples.get
    val sc = st.stsc.get
    assert(sc == Mp4Boxes.StscSummary(2, 3, 10))
    // a run schedule implying the WRONG total rejects: flip samples-per-
    // chunk of run 2 from 2 to 3 (implies 12 != 10)
    val stscMagic = "stsc".getBytes("US-ASCII")
    val sOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(stscMagic)).get - 4
    // entries at sOff+16: (first,spc,sdi) x2 -> run2 spc at +16+12+4
    val bad = b.clone(); bad(sOff + 16 + 12 + 4 + 3) = 3
    assert(Mp4Boxes.probe(bad).isEmpty)
    // non-increasing first_chunk rejects (run2 first: 3 -> 1)
    val nonInc = b.clone(); nonInc(sOff + 16 + 12 + 3) = 1
    assert(Mp4Boxes.probe(nonInc).isEmpty)
    // first run not starting at chunk 1 rejects
    val late = b.clone(); late(sOff + 16 + 3) = 2
    assert(Mp4Boxes.probe(late).isEmpty)
    // a run starting past the chunk count rejects (run2 first: 3 -> 9)
    val past = b.clone(); past(sOff + 16 + 12 + 3) = 9
    assert(Mp4Boxes.probe(past).isEmpty)
  }

  test("fragmented (CMAF) files: trun accounting across all three " +
    "default-resolution levels") {
    val t = vTrack // no stbl tables
    val frags = Seq(
      Mp4Boxes.SynthFrag(1, 0L, 3,
        Some(Seq(100L, 110L, 120L)), Some(Seq(10L, 20L, 30L)), None, 8),
      Mp4Boxes.SynthFrag(2, 330L, 2, None, None, Some((200L, 99L)), 4),
      Mp4Boxes.SynthFrag(3, 730L, 4, None, None, None, 12)) // trex defaults
    val b = Mp4Boxes.synthFragmented("cmfc", 7, Seq("iso6"), 30000, 0,
      t, (50L, 500L), frags, _ => 1)
    val info = Mp4Boxes.probe(b).get
    assert(info.fragmented && info.fragments.size == 3)
    val Vector(f1, f2, f3) = info.fragments
    assert(f1 == Mp4Boxes.Fragment(1, 1, 0L, 3, 330L, 60L))
    assert(f2 == Mp4Boxes.Fragment(2, 1, 330L, 2, 400L, 198L))
    assert(f3 == Mp4Boxes.Fragment(3, 1, 730L, 4, 200L, 2000L))
    assert(info.mdatBytes == 8 + 4 + 12)
    // non-fragmented files report no fragments
    assert(!Mp4Boxes.probe(synth()).get.fragmented)
    // hostile: a trun whose declared count leaves trailing bytes
    val trunMagic = "trun".getBytes("US-ASCII")
    val tOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(trunMagic)).get - 4
    val lying = b.clone(); lying(tOff + 8 + 4 + 3) = 2 // 3 -> 2 samples
    assert(Mp4Boxes.probe(lying).isEmpty)
    // hostile: tfdt with a reserved version
    val tfdtMagic = "tfdt".getBytes("US-ASCII")
    val dOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(tfdtMagic)).get + 4
    val badVer = b.clone(); badVer(dOff) = 2
    assert(Mp4Boxes.probe(badVer).isEmpty)
    // hostile: duplicate mfhd inside one moof
    val mfhdMagic = "mfhd".getBytes("US-ASCII")
    val mOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(mfhdMagic)).get
    val twoMfhd = b.clone()
    // retype the traf to mfhd: moof now has 2 mfhd, 0 traf
    val trafMagic = "traf".getBytes("US-ASCII")
    val trOff = b.indices.find(i => i + 4 <= b.length &&
      b.slice(i, i + 4).sameElements(trafMagic)).get
    mfhdMagic.zipWithIndex.foreach { case (ch, i) => twoMfhd(trOff + i) = ch }
    assert(mOff > 0 && Mp4Boxes.probe(twoMfhd).isEmpty)
  }

  test("keyframeByteRanges: stss -> stsc/stsz/stco walk lands on the " +
    "exact mdat bytes, both offset widths") {
    // 7 samples, sizes 10..16; chunk 1 holds 3 samples, chunks 2-3 hold 2
    // each; chunks tiled in mdat with a 2-byte gap before each chunk
    val sizes = (0 until 7).map(i => 10L + i)
    val prefix = sizes.scanLeft(0L)(_ + _)
    val chunkStarts = Seq(0, 3, 5)
    val relOffs = chunkStarts.zipWithIndex.map { case (cs, k) =>
      2L * (k + 1) + prefix(cs)
    }
    val mdatLen = (prefix(7) + 6 + 3).toInt
    for (co64 <- Seq(false, true)) {
      val t = SynthTrack(1, "vide", "avc1", 640, 360, 600, 700, "eng",
        sttsEntries = Seq((7L, 100L)),
        sizes = Some(Right(sizes)),
        chunks = 3, useCo64 = co64,
        syncSamples = Seq(1L, 4L, 7L),
        stscRuns = Seq((1L, 3L), (2L, 2L)),
        chunkOffsetsRelMdat = Some(relOffs))
      val b = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 700, Seq(t),
        mdatLen, i => i % 251)
      val mdatStart = b.length - mdatLen
      val got = Mp4Boxes.keyframeByteRanges(b).get
      assert(got.map(_.sample) == Vector(1L, 4L, 7L))
      // sample 1 (idx 0): chunk 0 head; sample 4 (idx 3): chunk 1 head;
      // sample 7 (idx 6): chunk 2, one sample in
      assert(got.map(_.offset - mdatStart) ==
        Vector(relOffs(0), relOffs(1), relOffs(2) + sizes(5)))
      assert(got.map(_.size) == Vector(10L, 13L, 16L))
      // the ranged read returns the planted fill bytes
      got.foreach { kr =>
        (0L until kr.size).foreach { j =>
          val abs = (kr.offset + j).toInt
          assert((b(abs) & 0xff) == (abs - mdatStart) % 251)
        }
      }
    }
    // absent stss = every sample is sync (spec default)
    val allSync = SynthTrack(1, "vide", "avc1", 640, 360, 600, 700, "eng",
      sttsEntries = Seq((7L, 100L)), sizes = Some(Right(sizes)),
      chunks = 3, stscRuns = Seq((1L, 3L), (2L, 2L)),
      chunkOffsetsRelMdat = Some(relOffs))
    val b2 = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 700,
      Seq(allSync), mdatLen, i => i % 251)
    assert(Mp4Boxes.keyframeByteRanges(b2).get.map(_.sample) ==
      (1L to 7L).toVector)
    // no stsc: chunk resolution undefined -> decline, never guess
    val noStsc = SynthTrack(1, "vide", "avc1", 640, 360, 600, 700, "eng",
      sttsEntries = Seq((7L, 100L)), sizes = Some(Right(sizes)),
      chunks = 3, syncSamples = Seq(1L, 4L))
    val b3 = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 700,
      Seq(noStsc), 32, i => i)
    assert(Mp4Boxes.keyframeByteRanges(b3).isEmpty)
    // a range escaping the file declines (legacy placeholder offsets point
    // chunk 2 past a tiny file)
    val escape = SynthTrack(1, "vide", "avc1", 640, 360, 600, 700, "eng",
      sttsEntries = Seq((7L, 100L)), sizes = Some(Right(sizes)),
      chunks = 3, syncSamples = Seq(1L, 4L, 7L),
      stscRuns = Seq((1L, 3L), (2L, 2L)))
    val b4 = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 700,
      Seq(escape), 8, i => i)
    assert(Mp4Boxes.keyframeByteRanges(b4).isEmpty)
    // wrong handler: no matching track
    assert(Mp4Boxes.keyframeByteRanges(b2, handler = "soun").isEmpty)
    // hostile bytes never throw
    b2.indices.foreach { i =>
      val c = b2.clone(); c(i) = (c(i) ^ 0x55).toByte
      Mp4Boxes.keyframeByteRanges(c)
    }
  }

  test("synthMp4 rejects out-of-contract inputs eagerly") {
    intercept[IllegalArgumentException] {
      Mp4Boxes.synthMp4("toolong5", 0, Nil, 600, 0, Seq(vTrack), 0, _ => 0)
    }
    intercept[IllegalArgumentException] {
      Mp4Boxes.synthMp4("isom", 0, Nil, 600, 0,
        Seq(vTrack.copy(lang = "EN1")), 0, _ => 0)
    }
  }

  private def synthEdited(track: SynthTrack, version1: Boolean = false) =
    Mp4Boxes.synthMp4("isom", 0, Seq("isom"), 600, 6000, Seq(track), 16,
      i => i, version1 = version1)

  test("edit lists: delay/trim/span decomposition, both elst versions") {
    val vt = vTrack.copy(edits = Seq((300L, -1L, 1), (900L, 450L, 1),
      (120L, 0L, 1)))
    for (v1 <- Seq(false, true)) {
      val t = Mp4Boxes.probe(synthEdited(vt, v1)).get.tracks.head
      assert(t.edits.length == 3, s"version1=$v1")
      assert(t.initialDelay == 300 && t.startTrim == 450)
      assert(t.editDuration == 1320)
      assert(t.edits.map(_.rateInt) == Vector(1, 1, 1))
    }
    // no initial empty edit -> no delay; first edit's media_time trims
    val noDelay = Mp4Boxes.probe(synthEdited(
      vTrack.copy(edits = Seq((600L, 42L, 1))))).get.tracks.head
    assert(noDelay.initialDelay == 0 && noDelay.startTrim == 42)
    // no edts at all -> empty edits, zero delay/trim
    val plain = Mp4Boxes.probe(synthEdited(vTrack)).get.tracks.head
    assert(plain.edits.isEmpty && plain.initialDelay == 0 && plain.startTrim == 0)
  }

  test("ctts composition offsets: signed v1 decode and stts coverage") {
    val base = vTrack.copy(sttsEntries = Seq((3L, 100L), (2L, 250L)),
      sizes = Some(Left(500L)), chunks = 2)
    // all-nonnegative -> version 0 (unsigned)
    val v0 = Mp4Boxes.probe(synthEdited(base.copy(
      cttsRuns = Seq((2L, 0L), (3L, 120L))))).get.tracks.head
    val s0 = v0.samples.get.ctts.get
    assert(s0.entryCount == 2 && s0.maxOffset == 120 && s0.sumOffsets == 360)
    // a negative offset -> version 1 (signed); an unsigned misread would
    // be off by 2^32 per negative sample
    val v1 = Mp4Boxes.probe(synthEdited(base.copy(
      cttsRuns = Seq((1L, -90L), (4L, 30L))))).get.tracks.head
    val s1 = v1.samples.get.ctts.get
    assert(s1.entryCount == 2 && s1.maxOffset == 30 && s1.sumOffsets == 30)
    // absent ctts stays None without rejecting the tables
    val no = Mp4Boxes.probe(synthEdited(base)).get.tracks.head
    assert(no.samples.get.ctts.isEmpty && no.samples.get.sampleCount == 5)
  }

  test("hostile elst/ctts bytes reject, never throw") {
    val edited = synthEdited(vTrack.copy(edits = Seq((300L, -1L, 1), (900L, 450L, 1)),
      sttsEntries = Seq((5L, 100L)), sizes = Some(Left(10L)), chunks = 1,
      cttsRuns = Seq((5L, 40L))))
    assert(Mp4Boxes.probe(edited).isDefined)
    def patch(magic: String)(f: (Array[Byte], Int) => Unit): Option[Mp4Boxes.Mp4Info] = {
      val c = edited.clone()
      val m = magic.getBytes("US-ASCII")
      val off = c.indices.find(i => i + 4 <= c.length &&
        c.slice(i, i + 4).sameElements(m)).get - 4
      f(c, off)
      Mp4Boxes.probe(c)
    }
    // elst entry count lies (declared 3, two entries present)
    assert(patch("elst")((c, o) => c(o + 8 + 4 + 3) = 3).isEmpty)
    // media_time below -1 (0xFFFFFFFE = -2) is malformed
    assert(patch("elst")((c, o) => c(o + 8 + 4 + 4 + 4 + 3) = 0xfe.toByte).isEmpty)
    // reserved elst fullbox version
    assert(patch("elst")((c, o) => c(o + 8) = 2).isEmpty)
    // ctts run-length coverage disagrees with stts (5 declared, patch to 6)
    assert(patch("ctts")((c, o) => c(o + 8 + 4 + 4 + 3) = 6).isEmpty)
    // ctts entry count lies -> mistiled box
    assert(patch("ctts")((c, o) => c(o + 8 + 4 + 3) = 2).isEmpty)
    // a zero-count ctts run
    assert(patch("ctts")((c, o) => c(o + 8 + 4 + 4 + 3) = 0).isEmpty)
  }
}
