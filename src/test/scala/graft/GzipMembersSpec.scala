package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GzipMembers

/** Gzip member walk: boundaries via real inflation, trailer
  * verification, header optional fields, and the hostile-byte sweep.
  */
class GzipMembersSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("ISO-8859-1")

  test("member boundaries, names, and round-tripped content") {
    val b = GzipMembers.synth(Seq(
      (bytes("first record here"), Some("a.warc")),
      (bytes("second"), None),
      (Array.emptyByteArray, Some("empty"))))
    val ms = GzipMembers.walk(b).get
    assert(ms.length == 3)
    assert(ms.map(_.name) == Vector(Some("a.warc"), None, Some("empty")))
    assert(new String(ms(0).content, "ISO-8859-1") == "first record here")
    assert(new String(ms(1).content, "ISO-8859-1") == "second")
    assert(ms(2).content.isEmpty)
    // stored-block closed form: 23 + content + name + NUL terminator
    assert(ms(0).compressedLength == 23 + 17 + 7)
    assert(ms(1).compressedLength == 23 + 6)
    assert(ms.map(_.compressedLength).sum == b.length)
    assert(ms(0).offset == 0)
    assert(ms(1).offset == ms(0).compressedLength)
  }

  test("really-deflated members inflate to the same content") {
    val text = bytes("repetitive payload " * 30)
    val b = GzipMembers.synth(Seq((text, None)), storedBlock = false)
    val ms = GzipMembers.walk(b).get
    assert(ms.length == 1)
    assert(ms.head.content.sameElements(text))
    assert(ms.head.compressedLength < text.length) // really compressed
  }

  test("trailer verification: CRC or ISIZE corruption rejects") {
    val b = GzipMembers.synth(Seq((bytes("check me"), None)))
    val crcAt = b.length - 8
    val badCrc = b.clone(); badCrc(crcAt) = (badCrc(crcAt) ^ 1).toByte
    assert(GzipMembers.walk(badCrc).isEmpty)
    val badIsize = b.clone()
    badIsize(b.length - 4) = (badIsize(b.length - 4) ^ 1).toByte
    assert(GzipMembers.walk(badIsize).isEmpty)
    // content corruption lands in the CRC too
    val badBody = b.clone(); badBody(15) = 'X'.toByte
    assert(GzipMembers.walk(badBody).isEmpty)
  }

  test("FHCRC: a valid header CRC16 walks; a corrupted one rejects") {
    val base = GzipMembers.synth(Seq((bytes("crc16 guarded"), None)))
    // graft an FHCRC field onto the 10-byte header: set FLG.FHCRC and
    // insert the CRC-16 (low 16 bits of CRC-32 over the header bytes)
    val hdr = base.take(10)
    hdr(3) = (hdr(3) | 0x02).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(hdr)
    val c16 = (crc.getValue & 0xffffL).toInt
    val withCrc = hdr ++
      Array[Byte]((c16 & 0xff).toByte, ((c16 >> 8) & 0xff).toByte) ++
      base.drop(10)
    val ms = GzipMembers.walk(withCrc).get
    assert(new String(ms.head.content, "ISO-8859-1") == "crc16 guarded")
    // a corrupted header (here: the stored CRC16 itself) must reject —
    // the scaladoc's corruption-yields-None claim covers the header too
    val bad = withCrc.clone()
    bad(10) = (bad(10) ^ 0x55).toByte
    assert(GzipMembers.walk(bad).isEmpty)
    // and a corrupted header byte COVERED by the CRC16 rejects too
    val badHdr = withCrc.clone()
    badHdr(9) = (badHdr(9) ^ 0x01).toByte // OS field, carried not parsed
    assert(GzipMembers.walk(badHdr).isEmpty)
  }

  test("hostile bytes: headers, truncation, trailing garbage") {
    val b = GzipMembers.synth(Seq((bytes("payload"), None)))
    assert(GzipMembers.walk(Array.emptyByteArray).isEmpty)
    assert(GzipMembers.walk(b.take(9)).isEmpty) // shorter than a header
    assert(GzipMembers.walk(b.dropRight(1)).isEmpty) // truncated trailer
    assert(GzipMembers.walk(b ++ Array[Byte](1, 2, 3)).isEmpty)
    val badMagic = b.clone(); badMagic(0) = 0x1e
    assert(GzipMembers.walk(badMagic).isEmpty)
    val badMethod = b.clone(); badMethod(2) = 7
    assert(GzipMembers.walk(badMethod).isEmpty)
    val reserved = b.clone(); reserved(3) = 0x20
    assert(GzipMembers.walk(reserved).isEmpty)
    // an FNAME flag with no name bytes present: the walk resynchronizes
    // on whatever byte pattern follows and must reject, never throw
    val noNul = b.clone(); noNul(3) = 0x08
    assert(GzipMembers.walk(noNul).isEmpty)
    // a truncated deflate stream mid-member
    assert(GzipMembers.walk(b.take(14)).isEmpty)
  }
}
