package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Id3

/** ID3v2 tag walk: both version layouts, all four encodings, binary
  * frames, padding, terminator stripping, and the hostile-byte posture
  * (every malformation -> None, never a throw).
  */
class Id3Spec extends AnyFunSuite {

  private val basic = Seq(("TIT2", "hello", 0), ("TPE1", "worlds", 0))

  test("v2.4 round trip: text frames, sizes, padding") {
    val b = Id3.synthTag(4, basic, padding = 12)
    val t = Id3.parse(b).get
    assert(t.major == 4)
    assert(t.nFrames == 2)
    assert(t.text("TIT2").contains("hello"))
    assert(t.text("TPE1").contains("worlds"))
    assert(t.paddingBytes == 12)
    // frame = 10-byte header + 1 encoding byte + text
    assert(t.frames.map(_.size) == Vector(6, 7))
    assert(t.tagBytes == 10 + (11 + 5) + (11 + 6) + 12)
    assert(t.tagBytes == b.length)
  }

  test("v2.2 round trip: 3-char ids, 3-byte sizes, no flags bytes") {
    val v22 = Seq(("TT2", "hello", 0), ("TP1", "worlds", 1))
    val b = Id3.synthTag(2, v22, padding = 7)
    val t = Id3.parse(b).get
    assert(t.major == 2)
    assert(t.nFrames == 2)
    assert(t.text("TT2").contains("hello"))
    assert(t.text("TP1").contains("worlds"))
    assert(t.paddingBytes == 7)
    // frame = 6-byte header + 1 encoding byte + payload
    // (UCS-2 "worlds" = BOM 2 + 12 bytes)
    assert(t.frames.map(_.size) == Vector(6, 15))
    assert(t.tagBytes == 10 + (7 + 5) + (7 + 14) + 7)
    assert(t.tagBytes == b.length)
    // TXX is the v2.2 user-text frame: walked, not decoded
    val tb = Id3.synthTag(2, Seq(("TT2", "a", 0), ("TXX", "k", 0)), 0)
    val tt = Id3.parse(tb).get
    assert(tt.frames(1).id == "TXX" && tt.frames(1).text.isEmpty)
    // 4-char ids cannot synth under v2.2; 3-char cannot under v2.3
    intercept[IllegalArgumentException](Id3.synthTag(2, basic, 0))
    intercept[IllegalArgumentException](Id3.synthTag(3, v22, 0))
    // v2.2 has no UTF-8 encoding
    intercept[IllegalArgumentException](Id3.synthTag(2, Seq(("TT2", "a", 3)), 0))
    // a v2.2 frame body with encoding 2 must reject at parse
    val b2 = Id3.synthTag(2, Seq(("TT2", "ab", 0)), padding = 0)
    b2(16) = 2 // the encoding byte of the first frame body
    assert(Id3.parse(b2).isEmpty)
  }

  test("unsynchronisation round trip: FF 00 pairs collapse before the walk") {
    // UCS-2 text carries a guaranteed 0xFF byte (the BOM's second half)
    val frames = Seq(("TIT2", "hi", 1), ("TPE1", "y\u00ff", 0))
    val plain = Id3.synthTag(3, frames, padding = 4)
    val uns = Id3.synthTag(3, frames, padding = 4, unsync = true)
    assert(uns.length > plain.length) // FF bytes really gained successors
    assert((uns(5) & 0x80) != 0)
    val t = Id3.parse(uns).get
    assert(t.unsync && !Id3.parse(plain).get.unsync)
    assert(t.text("TIT2").contains("hi"))
    assert(t.text("TPE1").contains("y\u00ff"))
    assert(t.paddingBytes == 4)
    assert(t.tagBytes == uns.length) // the ENCODED span is the tag span
    // decoded content identical to the plain form's
    val p = Id3.parse(plain).get
    assert(t.frames == p.frames)
    // v2.2 unsync works too; v2.4 whole-tag unsync declines
    val u22 = Id3.synthTag(2, Seq(("TT2", "a\u00ff", 0)), 0, unsync = true)
    assert(Id3.parse(u22).get.text("TT2").contains("a\u00ff"))
    intercept[IllegalArgumentException](
      Id3.synthTag(4, Seq(("TIT2", "a", 0)), 0, unsync = true))
    val v24 = Id3.synthTag(4, Seq(("TIT2", "a", 0)), 0)
    val flagged = v24.clone(); flagged(5) = 0x80.toByte
    assert(Id3.parse(flagged).isEmpty)
  }

  test("v2.3 uses plain 32-bit frame sizes") {
    val b = Id3.synthTag(3, basic, padding = 0)
    val t = Id3.parse(b).get
    assert(t.major == 3)
    assert(t.text("TIT2").contains("hello"))
    // a frame size that needs bit 7 of a size byte: 200-char text is
    // syncsafe-illegal per byte but fine as plain 32-bit in v2.3
    val big = Id3.synthTag(3, Seq(("TALB", "x" * 200, 0)), padding = 0)
    assert(Id3.parse(big).get.text("TALB").contains("x" * 200))
  }

  test("all four encodings decode; 2/3 are v2.4-only") {
    for (enc <- 0 to 3) {
      val b = Id3.synthTag(4, Seq(("TIT2", "café", enc)), padding = 0)
      val t = Id3.parse(b).get
      assert(t.text("TIT2").contains("café"), s"enc $enc")
      assert(t.frames.head.encoding == enc)
    }
    for (enc <- 0 to 1) {
      val b = Id3.synthTag(3, Seq(("TIT2", "ab", enc)), padding = 0)
      assert(Id3.parse(b).get.text("TIT2").contains("ab"))
    }
    intercept[IllegalArgumentException](Id3.synthTag(3, Seq(("TIT2", "a", 3)), 0))
    // a hand-patched v2.3 tag with encoding 3 must reject
    val b3 = Id3.synthTag(3, Seq(("TIT2", "ab", 0)), padding = 0)
    b3(20) = 3 // the encoding byte of the first frame body
    assert(Id3.parse(b3).isEmpty)
  }

  test("UTF-16 little-endian BOM decodes; BOM-less encoding-01 rejects") {
    val be = Id3.synthTag(4, Seq(("TIT2", "hi", 1)), padding = 0)
    // flip BOM to FF FE and byte-swap the payload -> same text, LE form
    val le = be.clone()
    le(21) = 0xff.toByte; le(22) = 0xfe.toByte
    le(23) = 'h'.toByte; le(24) = 0; le(25) = 'i'.toByte; le(26) = 0
    assert(Id3.parse(le).get.text("TIT2").contains("hi"))
    val noBom = be.clone()
    noBom(21) = 0; noBom(22) = 'h'.toByte // not a BOM
    assert(Id3.parse(noBom).isEmpty)
  }

  test("one trailing NUL terminator is stripped from text") {
    val b = Id3.synthTag(4, Seq(("TIT2", "abc" + 0.toChar, 0)), padding = 0)
    assert(Id3.parse(b).get.text("TIT2").contains("abc"))
  }

  test("binary frames are walked, not decoded; TXXX is not a text frame") {
    val b = Id3.synthTag(4, Seq(("TIT2", "t", 0)),
      padding = 3, binFrames = Seq(("PRIV", Array[Byte](1, 2, 3)),
        ("TXXX", Array[Byte](0, 65, 0, 66))))
    val t = Id3.parse(b).get
    assert(t.nFrames == 3)
    val priv = t.frames.find(_.id == "PRIV").get
    assert(priv.text.isEmpty && priv.encoding == -1 && priv.size == 3)
    assert(t.frames.find(_.id == "TXXX").get.text.isEmpty)
    assert(t.paddingBytes == 3)
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val good = Id3.synthTag(4, basic, padding = 4)
    def mut(f: Array[Byte] => Unit): Option[Id3.Id3Tag] = {
      val c = good.clone(); f(c); Id3.parse(c)
    }
    assert(Id3.parse(Array.empty[Byte]).isEmpty)
    assert(Id3.parse("ID3".getBytes).isEmpty) // truncated header
    assert(mut(_(3) = 2).isEmpty) // v2.4 frames misparse as v2.2 layout
    assert(mut(_(5) = 0x80.toByte).isEmpty) // v2.4 whole-tag unsync declines
    assert(mut(_(5) = 0x40.toByte).isEmpty) // extended header flag
    assert(mut(_(9) = (good(9) + 40).toByte).isEmpty) // tag overruns input
    assert(mut(_(6) = 0x80.toByte).isEmpty) // non-syncsafe tag size
    assert(mut(_(10) = 't'.toByte).isEmpty) // lowercase frame id
    assert(mut(_(18) = 0x01.toByte).isEmpty) // frame flag bit set
    assert(mut(b => b(b.length - 1) = 7).isEmpty) // junk inside padding
    // a frame whose declared size overruns the tag
    assert(mut(_(17) = 0x7f.toByte).isEmpty)
    // truncated mid-frame-header: tag size says 5 bytes of frame space
    val tiny = Id3.synthTag(4, Seq(("TIT2", "abcdefgh", 0)), padding = 0)
    assert(Id3.parse(tiny.take(15)).isEmpty)
    // zero frames (all padding) rejects
    val hdr = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 8) ++
      Array.fill(8)(0.toByte)
    assert(Id3.parse(hdr).isEmpty)
    // odd-length UTF-16 body
    val utf = Id3.synthTag(4, Seq(("TIT2", "hi", 1)), padding = 0)
    val odd = utf.clone()
    odd(17) = (odd(17) - 1).toByte // shrink frame size by one -> odd payload
    assert(Id3.parse(odd).isEmpty)
  }

  test("parse agrees with MpegFrames' tag-span accounting") {
    import graft.operators.MpegFrames
    val tag = Id3.synthTag(3, basic :+ (("TYER", "1987", 1)), padding = 9)
    val stream = MpegFrames.synthStream(3, 0, Seq((9, false), (9, true)),
      (fi, j) => (fi + j) % 100)
    val bytes = tag ++ stream
    val info = MpegFrames.probe(bytes).get
    val parsed = Id3.parse(bytes).get
    assert(info.id3v2Bytes == parsed.tagBytes)
    assert(parsed.text("TYER").contains("1987"))
    assert(info.nFrames == 2)
  }
}
