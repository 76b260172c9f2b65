package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FlacProbe

/** FLAC probe: STREAMINFO bit unpacking, the little-endian vorbis
  * comment block, block-walk semantics, and the hostile-byte sweep.
  */
class FlacProbeSpec extends AnyFunSuite {

  private def synth(rate: Int = 44100, channels: Int = 2, bps: Int = 16,
      samples: Long = 441000L, withComment: Boolean = true,
      padding: Int = 64, frames: Int = 300) =
    FlacProbe.synth(1152, 4608, 210, 4410, rate, channels, bps, samples,
      "vend", Seq(("TITLE", "song"), ("ARTIST", "band")), withComment,
      padding, frames, i => i * 3 + 1)

  test("round trip: packed stream parameters, tags, block accounting") {
    val b = synth()
    val f = FlacProbe.probe(b).get
    assert(f.info.sampleRate == 44100 && f.info.channels == 2)
    assert(f.info.bitsPerSample == 16 && f.info.totalSamples == 441000L)
    assert(f.info.minBlock == 1152 && f.info.maxBlock == 4608)
    assert(f.info.minFrame == 210 && f.info.maxFrame == 4410)
    assert(f.durationMs == 10000L)
    assert(f.vendor == "vend")
    assert(f.tag("TITLE").contains("song") && f.tag("artist").contains("band"))
    assert(f.nBlocks == 3 && f.paddingBytes == 64 && f.frameBytes == 300)
    // marker 4 + streaminfo 38 + comment 4+(4+4)+(4+10)+(4+11) + pad 4+64
    assert(b.length == 4 + 38 + (4 + 8 + 4 + 14 + 15) + 68 + 300)
  }

  test("seektable decodes: real points, placeholders, 64-bit offsets") {
    val pts = Seq((0L, 0L, 4096), (88200L, (3L << 33) + 7777L, 4096),
      (441000L, (9L << 32) + 123L, 2048))
    val b = FlacProbe.synth(1152, 4608, 210, 4410, 44100, 2, 16, 441000L,
      "v", Nil, withComment = false, paddingLen = -1, frameLen = 50,
      i => i, seekPoints = pts, seekPlaceholders = 2)
    val f = FlacProbe.probe(b).get
    val s = f.seek.get
    assert(s.nPoints == 3 && s.nPlaceholders == 2)
    assert(s.firstSample == 0L && s.lastSample == 441000L)
    // the high words must survive: a 32-bit misread loses 3*2^33 + 9*2^32
    assert(s.offsetSum == (3L << 33) + 7777L + (9L << 32) + 123L)
    assert(f.nBlocks == 2)
    // non-ascending real points reject: swap point 1's sample down
    val tableAt = 4 + 38 + 4 // marker + streaminfo + seektable header
    val bad = b.clone()
    bad(tableAt + 18 + 7) = 0 // 88200 -> high-byte-zeroed smaller value
    (0 until 7).foreach(i => bad(tableAt + 18 + i) = 0)
    assert(FlacProbe.probe(bad).isEmpty) // 0 after 0: not ascending
    // a real point after a placeholder rejects: make point 0 a placeholder
    val ph = b.clone()
    (0 until 8).foreach(i => ph(tableAt + i) = 0xff.toByte)
    assert(FlacProbe.probe(ph).isEmpty)
    // a length not tiling into 18-byte points rejects
    val mistiled = b.clone()
    mistiled(4 + 38 + 3) = (18 * 5 - 1).toByte // header len low byte
    assert(FlacProbe.probe(mistiled).isEmpty)
  }

  test("picture block decodes big-endian; vorbis comment stays little") {
    val pic = Some((3, "image/png", "cover art", 640L, 480L, 24L, 0L, 77))
    val b = FlacProbe.synth(1152, 4608, 210, 4410, 44100, 2, 16, 441000L,
      "vend", Seq(("TITLE", "t")), withComment = true, paddingLen = 8,
      frameLen = 60, i => i * 5 + 2, picture = pic)
    val f = FlacProbe.probe(b).get
    val p = f.picture.get
    assert(p.picType == 3 && p.mime == "image/png")
    assert(p.description == "cover art")
    assert(p.width == 640L && p.height == 480L && p.depth == 24L)
    assert(p.colors == 0L && p.dataBytes == 77L)
    assert(f.nPictures == 1)
    assert(f.tag("TITLE").contains("t")) // LE comment coexists
    assert(f.nBlocks == 4)
    // picture type above the spec's 20 rejects
    val picAt = 4 + 38 + 4 // marker + streaminfo + picture header
    val bad = b.clone(); bad(picAt + 3) = 21
    assert(FlacProbe.probe(bad).isEmpty)
    // a mime length overrunning the block rejects
    val over = b.clone(); over(picAt + 4 + 2) = 0x7f.toByte
    assert(FlacProbe.probe(over).isEmpty)
  }

  test("bit-field extremes: 20-bit rate, 8 channels, 32 bps, 36-bit samples") {
    val b = FlacProbe.synth(16, 16, 0, 0, (1 << 20) - 1, 8, 32,
      (1L << 36) - 1, "v", Nil, withComment = false, paddingLen = -1,
      frameLen = 10, i => i)
    val f = FlacProbe.probe(b).get
    assert(f.info.sampleRate == (1 << 20) - 1)
    assert(f.info.channels == 8 && f.info.bitsPerSample == 32)
    assert(f.info.totalSamples == (1L << 36) - 1)
    assert(f.nBlocks == 1 && f.vendor == "" && f.comments.isEmpty)
  }

  test("comment keys are case-normalized; values verbatim") {
    val b = FlacProbe.synth(1152, 1152, 0, 0, 8000, 1, 16, 100L, "v",
      Seq(("Title", "MiXeD=case"), ("a", "b")), withComment = true,
      paddingLen = -1, frameLen = 0, i => i)
    val f = FlacProbe.probe(b).get
    // only the FIRST '=' splits; the value keeps the rest verbatim
    assert(f.tag("TITLE").contains("MiXeD=case"))
    assert(f.tag("A").contains("b"))
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = synth()
    assert(FlacProbe.probe(Array.emptyByteArray).isEmpty)
    assert(FlacProbe.probe("fLaX1234".getBytes).isEmpty) // wrong marker
    Seq(1, 40, 100, b.length - 310).foreach { cut =>
      assert(FlacProbe.probe(b.slice(0, b.length - cut)).isEmpty ||
        FlacProbe.probe(b.slice(0, b.length - cut)).get.frameBytes ==
          300 - cut, s"cut $cut") // cutting frames shrinks the span only
    }
    def mut(f: Array[Byte] => Unit): Option[FlacProbe.FlacInfo] = {
      val c = b.clone(); f(c); FlacProbe.probe(c)
    }
    // first block not STREAMINFO (type patched to 2)
    assert(mut(_(4) = 2).isEmpty)
    // STREAMINFO with a wrong declared length
    assert(mut(_(7) = 35).isEmpty)
    // reserved block type 127
    assert(mut(_(4 + 38) = 127).isEmpty)
    // a second STREAMINFO (comment block re-typed as 0)
    assert(mut(_(4 + 38) = 0).isEmpty)
    // zero sample rate: clear the 20 rate bits (bytes 10-12 of the body)
    assert(mut { c => c(4 + 4 + 10) = 0; c(4 + 4 + 11) = 0
      c(4 + 4 + 12) = (c(4 + 4 + 12) & 0x0f).toByte }.isEmpty)
    // no last-block flag anywhere: clear it on the padding block, whose
    // body then swallows the frame span and the walk runs off the end
    val padHdr = 4 + 38 + (4 + 8 + 4 + 14 + 15)
    assert(mut(c => c(padHdr) = (c(padHdr) & 0x7f).toByte).isEmpty)
    // a block overrunning the payload (padding length's middle byte)
    assert(mut(_(padHdr + 2) = 0xff.toByte).isEmpty)
    // vorbis vendor length overrunning its block
    val cHdr = 4 + 38
    assert(mut(_(cHdr + 4) = 0xff.toByte).isEmpty)
    // vorbis comment count lying (says 3, two present)
    assert(mut(_(cHdr + 4 + 4 + 4) = 3).isEmpty)
    // a comment with no '=' separator ("TITLE=song" -> "TITLE_song")
    assert(mut(_(cHdr + 4 + 8 + 4 + 4 + 5) = '_'.toByte).isEmpty)
  }

  test("synth rejects out-of-contract inputs eagerly") {
    intercept[IllegalArgumentException] {
      FlacProbe.synth(0, 0, 0, 0, 0, 1, 16, 0, "v", Nil, false, -1, 0, i => i)
    }
    intercept[IllegalArgumentException] {
      FlacProbe.synth(0, 0, 0, 0, 8000, 9, 16, 0, "v", Nil, false, -1, 0, i => i)
    }
    intercept[IllegalArgumentException] {
      FlacProbe.synth(0, 0, 0, 0, 8000, 2, 16, 1L << 36, "v", Nil, false, -1,
        0, i => i)
    }
  }
}
