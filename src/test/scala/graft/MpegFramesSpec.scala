package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MpegFrames

/** MPEG-1 audio frame-walk tests: spec frame-size arithmetic, sync walk
  * over synthesized valid streams (all three layers, VBR, padding), ID3
  * tag handling, and the hostile-input contract (None, never throw).
  */
class MpegFramesSpec extends AnyFunSuite {

  private val fill = (fi: Int, j: Int) => (fi * 7 + j * 13) % 251

  test("frame size arithmetic matches the spec forms") {
    // Layer II/III: 144000 * kbps / fs (+pad). Layer I: slot-counted * 4.
    assert(MpegFrames.frameBytes(2, 64, 48000, padded = false) == 192)
    assert(MpegFrames.frameBytes(2, 64, 48000, padded = true) == 193)
    assert(MpegFrames.frameBytes(3, 128, 44100, padded = false) == 417)
    assert(MpegFrames.frameBytes(1, 32, 48000, padded = false) == 32)
    assert(MpegFrames.frameBytes(1, 32, 48000, padded = true) == 36) // +1 slot
    assert(MpegFrames.samplesPerFrame(1) == 384)
    assert(MpegFrames.samplesPerFrame(2) == 1152)
    assert(MpegFrames.samplesPerFrame(3) == 1152)
  }

  test("probe walks synthesized streams: all layers, VBR, padding, duration") {
    for (layer <- 1 to 3; srIdx <- 0 to 2) {
      val frames = Seq((3, false), (14, true), (1, false), (7, true))
      val b = MpegFrames.synthStream(layer, srIdx, frames, fill)
      val info = MpegFrames.probe(b).get
      assert(info.layer == layer && info.channels == 1)
      assert(info.sampleRate == Seq(44100, 48000, 32000)(srIdx))
      assert(info.nFrames == 4 && info.id3v2Bytes == 0 && !info.id3v1)
      assert(info.frames.map(_.padded) == Seq(false, true, false, true))
      assert(info.nSamples == 4L * (if (layer == 1) 384 else 1152))
      assert(info.durationMs == info.nSamples * 1000L / info.sampleRate)
      // frame offsets partition the stream exactly
      assert(info.frames.head.offset == 0)
      assert(b.length == info.frames.map(f =>
        MpegFrames.frameBytes(layer, f.bitrateKbps, info.sampleRate, f.padded)).sum)
    }
  }

  test("ID3v2 prefix is skipped by syncsafe size; ID3v1 trailer recognized") {
    val b = MpegFrames.synthStream(2, 1, Seq((5, false), (5, false)), fill,
      id3v2Body = 300, id3v1 = true)
    val info = MpegFrames.probe(b).get
    assert(info.id3v2Bytes == 310 && info.id3v1)
    assert(info.nFrames == 2 && info.frames.head.offset == 310)
    assert(b.length == 310 + 2 * MpegFrames.frameBytes(2, 80, 48000, padded = false) + 128)
  }

  test("Xing/Info VBR tag roundtrips from the first Layer III frame") {
    val frames = Seq((12, false), (3, true), (5, false))
    val full = MpegFrames.XingTag(vbr = true, frames = Some(3L),
      bytes = Some(999L), toc = true, quality = Some(42L))
    val b = MpegFrames.synthStream(3, 1, frames, fill, xing = Some(full))
    val x = MpegFrames.probe(b).get.xing.get
    assert(x == full)
    // Info variant with a sparse field set: absent fields are None
    val sparse = MpegFrames.XingTag(vbr = false, frames = Some(3L),
      bytes = None, toc = false, quality = None)
    val b2 = MpegFrames.synthStream(3, 0, frames, fill, xing = Some(sparse))
    assert(MpegFrames.probe(b2).get.xing.get == sparse)
    // no tag written -> None (the fill bytes must not alias as a tag)
    val b3 = MpegFrames.synthStream(3, 1, frames, fill)
    assert(MpegFrames.probe(b3).get.xing.isEmpty)
    // Layer II streams have no Xing structure
    val b4 = MpegFrames.synthStream(2, 1, frames, fill)
    assert(MpegFrames.probe(b4).get.xing.isEmpty)
    // a flags word claiming a field the frame cannot hold -> tag rejected,
    // stream still walks (96-byte Layer III frame: 32 kbps @ 48 kHz has
    // room for the 8-byte tag head but not frames+bytes+TOC+quality)
    val small = MpegFrames.synthStream(3, 1, Seq((1, false), (1, false)), fill)
    val off = 4 + 17
    Array[Byte]('X', 'i', 'n', 'g', 0, 0, 0, 15).zipWithIndex.foreach {
      case (c, k) => small(off + k) = c
    }
    val pSmall = MpegFrames.probe(small).get
    assert(pSmall.xing.isEmpty && pSmall.nFrames == 2)
    // STEREO stream: mode bits read as 2 channels, and the Xing tag sits
    // after the 32-byte stereo side info instead of the 17-byte mono one
    val st = MpegFrames.synthStream(3, 1, frames, fill, xing = Some(full),
      channels = 2)
    val pst = MpegFrames.probe(st).get
    assert(pst.channels == 2 && pst.xing.get == full)
    // a MONO-offset reader would find no tag at the stereo offset: verify
    // the tag truly sits at 4+32 by checking the magic directly
    assert(new String(st.slice(4 + 32, 4 + 36), "US-ASCII") == "Xing")
    // synthStream refuses a tag that cannot fit its frame
    intercept[IllegalArgumentException] {
      MpegFrames.synthStream(3, 1, Seq((1, false)), fill, xing = Some(full))
    }
    intercept[IllegalArgumentException] {
      MpegFrames.synthStream(2, 1, frames, fill, xing = Some(full))
    }
    // CRC-PROTECTED stream (protection bit 0): the 16-bit CRC sits between
    // header and side info, so the tag lands 2 bytes later — the probe must
    // still find it (a no-CRC-offset reader would report xing=None here)
    val cb = MpegFrames.synthStream(3, 1, frames, fill, xing = Some(full),
      crc = true)
    val pc = MpegFrames.probe(cb).get
    assert(pc.xing.get == full)
    assert(new String(cb.slice(4 + 2 + 17, 4 + 2 + 21), "US-ASCII") == "Xing")
    // CRC'd STEREO: both shifts compose (2-byte CRC + 32-byte side info)
    val cst = MpegFrames.synthStream(3, 1, frames, fill, xing = Some(full),
      channels = 2, crc = true)
    assert(MpegFrames.probe(cst).get.xing.get == full)
    assert(new String(cst.slice(4 + 2 + 32, 4 + 2 + 36), "US-ASCII") == "Xing")
  }

  test("hostile inputs return None, never throw") {
    val good = MpegFrames.synthStream(2, 1, Seq((5, false), (8, true)), fill)
    assert(MpegFrames.probe(good).isDefined)
    assert(MpegFrames.probe(Array.emptyByteArray).isEmpty)
    assert(MpegFrames.probe("not audio at all".getBytes("US-ASCII")).isEmpty)
    // truncated mid-frame
    assert(MpegFrames.probe(good.take(good.length - 3)).isEmpty)
    // trailing garbage that is not a frame header or ID3v1 tag
    assert(MpegFrames.probe(good ++ Array[Byte](1, 2, 3)).isEmpty)
    // mid-stream sample-rate change: two self-valid streams concatenated
    val other = MpegFrames.synthStream(2, 0, Seq((5, false)), fill)
    assert(MpegFrames.probe(good ++ other).isEmpty)
    // mid-stream layer change
    val layer1 = MpegFrames.synthStream(1, 1, Seq((5, false)), fill)
    assert(MpegFrames.probe(good ++ layer1).isEmpty)
    // free-format (bitrate index 0) and forbidden (15) headers
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(MpegFrames.probe(free).isEmpty)
    val forb = good.clone(); forb(2) = (forb(2) | 0xf0).toByte
    assert(MpegFrames.probe(forb).isEmpty)
    // reserved layer code (00) and non-MPEG-1 version
    val badLayer = good.clone(); badLayer(1) = (badLayer(1) & ~0x06).toByte
    assert(MpegFrames.probe(badLayer).isEmpty)
    val badVer = good.clone(); badVer(1) = (badVer(1) & ~0x08).toByte
    assert(MpegFrames.probe(badVer).isEmpty)
    // reserved sample-rate code
    val badSr = good.clone(); badSr(2) = (badSr(2) | 0x0c).toByte
    assert(MpegFrames.probe(badSr).isEmpty)
    // ID3v2 with a non-syncsafe size byte
    val badId3 = MpegFrames.synthStream(2, 1, Seq((5, false)), fill,
      id3v2Body = 10)
    badId3(6) = 0x80.toByte
    assert(MpegFrames.probe(badId3).isEmpty)
    // single-byte corruption sweep: every flip either still probes or
    // returns None — never throws
    for (i <- good.indices) {
      val c = good.clone(); c(i) = (c(i) ^ 0x5a).toByte
      MpegFrames.probe(c) // must not throw
    }
  }
}
