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

  test("synthMp4 rejects out-of-contract inputs eagerly") {
    intercept[IllegalArgumentException] {
      Mp4Boxes.synthMp4("toolong5", 0, Nil, 600, 0, Seq(vTrack), 0, _ => 0)
    }
    intercept[IllegalArgumentException] {
      Mp4Boxes.synthMp4("isom", 0, Nil, 600, 0,
        Seq(vTrack.copy(lang = "EN1")), 0, _ => 0)
    }
  }
}
