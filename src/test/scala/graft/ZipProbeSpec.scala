package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZipProbe
import graft.operators.ZipProbe.SynthMember

/** ZIP probe + extraction: wire-format round trips for both methods,
  * real-Deflater streams, CRC/size verification, and the hostile-byte
  * sweep (every malformation -> None, never a throw).
  */
class ZipProbeSpec extends AnyFunSuite {

  private def member(name: String, text: String, method: Int,
      storedBlock: Boolean = true) =
    SynthMember(name, text.getBytes("UTF-8"), method, storedBlock)

  private val two = Seq(
    member("a.txt", "hello zip world", 0),
    member("dir/b.txt", "bbbbbbbbbbbbbbbbbbbbbbbb", 8))

  test("round trip: entries, sizes, offsets, comment, byte accounting") {
    val b = ZipProbe.synth(two, "the comment")
    val info = ZipProbe.probe(b).get
    assert(info.nEntries == 2 && info.comment == "the comment")
    val Vector(e1, e2) = info.entries
    assert(e1.name == "a.txt" && e1.method == 0)
    assert(e1.usize == 15 && e1.csize == 15)
    assert(e2.name == "dir/b.txt" && e2.method == 8)
    assert(e2.usize == 24 && e2.csize == 29) // stored-block: usize + 5
    assert(e1.lfhOffset == 0)
    assert(e2.lfhOffset == 30 + 5 + 15)
    assert(info.cdOffset == (30 + 5 + 15) + (30 + 9 + 29))
    assert(info.cdSize == (46 + 5) + (46 + 9))
    assert(b.length == info.cdOffset + info.cdSize + 22 + 11)
    assert(new String(ZipProbe.extract(b, e1).get, "UTF-8") == "hello zip world")
    assert(new String(ZipProbe.extract(b, e2).get, "UTF-8") ==
      "bbbbbbbbbbbbbbbbbbbbbbbb")
  }

  test("a real Deflater stream inflates back to the exact content") {
    val text = "squeeze me " * 40
    val b = ZipProbe.synth(Seq(member("c.txt", text, 8, storedBlock = false)),
      "")
    val info = ZipProbe.probe(b).get
    val e = info.entries.head
    assert(e.usize == text.length && e.csize < text.length) // really compressed
    assert(new String(ZipProbe.extract(b, e).get, "UTF-8") == text)
  }

  test("empty archive and empty members are valid") {
    val empty = ZipProbe.synth(Nil, "")
    assert(empty.length == 22)
    assert(ZipProbe.probe(empty).get.nEntries == 0)
    for (m <- Seq(0, 8)) {
      val b = ZipProbe.synth(Seq(member("e.txt", "", m)), "")
      val info = ZipProbe.probe(b).get
      assert(info.entries.head.usize == 0)
      assert(ZipProbe.extract(b, info.entries.head).get.isEmpty)
    }
  }

  test("an EOCD-signature lookalike inside the comment does not mislead") {
    val sig = new String(Array[Byte](0x50, 0x4b, 0x05, 0x06), "ISO-8859-1")
    val b = ZipProbe.synth(two, "x" + sig + "y")
    val info = ZipProbe.probe(b).get
    assert(info.nEntries == 2 && info.comment.length == 6)
  }

  test("extraction verifies CRC and size; corruption yields None") {
    val b = ZipProbe.synth(two, "")
    val info = ZipProbe.probe(b).get
    val e1 = info.entries.head
    // flip one payload byte of the stored member: headers stay agreeing,
    // probe still passes, extract must fail the CRC
    val corrupt = b.clone()
    corrupt(e1.dataOffset.toInt + 3) = 'X'.toByte
    val pi = ZipProbe.probe(corrupt).get
    assert(ZipProbe.extract(corrupt, pi.entries.head).isEmpty)
    assert(ZipProbe.extract(corrupt, pi.entries(1)).isDefined) // untouched
    // corrupt the deflate stream itself (block header byte)
    val e2 = info.entries(1)
    val badStream = b.clone()
    badStream(e2.dataOffset.toInt) = 0x07 // BTYPE=11: reserved -> DataFormatException path
    assert(ZipProbe.extract(badStream, ZipProbe.probe(badStream).get.entries(1)).isEmpty)
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = ZipProbe.synth(two, "cm")
    assert(ZipProbe.probe(Array.emptyByteArray).isEmpty)
    assert(ZipProbe.probe(b.take(21)).isEmpty) // shorter than an EOCD
    assert(ZipProbe.probe(b.dropRight(1)).isEmpty) // truncated comment
    val eocd = b.length - 22 - 2 // comment "cm"
    def mut(f: Array[Byte] => Unit): Option[ZipProbe.ZipInfo] = {
      val c = b.clone(); f(c); ZipProbe.probe(c)
    }
    assert(mut(_(eocd + 4) = 1).isEmpty) // multi-disk
    assert(mut(_(eocd + 8) = 3).isEmpty) // entry counts disagree
    assert(mut(c => { c(eocd + 8) = 3; c(eocd + 10) = 3 }).isEmpty) // count lies
    assert(mut(_(eocd + 16) = (b(eocd + 16) + 1).toByte).isEmpty) // cdOffset off by 1
    assert(mut(_(eocd + 12) = (b(eocd + 12) + 1).toByte).isEmpty) // cdSize off by 1
    val cd = (ZipProbe.probe(b).get.cdOffset).toInt
    assert(mut(_(cd) = 0).isEmpty) // central signature broken
    assert(mut(_(cd + 10) = 9).isEmpty) // method 9: unsupported
    assert(mut(_(cd + 8) = 1).isEmpty) // encrypted bit
    assert(mut(_(cd + 8) = 8).isEmpty) // data-descriptor bit: declined
    assert(mut(_(cd + 20) = (b(cd + 20) + 1).toByte).isEmpty) // stored csize != usize
    assert(mut(_(cd + 46) = 'z'.toByte).isEmpty) // directory/local name mismatch
    assert(mut(_(cd + 42) = (b(cd + 42) + 1).toByte).isEmpty) // lfh offset off: bad sig
    // local header field disagreeing with the directory (method)
    assert(mut(_(8) = 8).isEmpty)
    // declared usize lies: probe passes (headers agree), extract fails
    val lie = b.clone()
    val inf0 = ZipProbe.probe(b).get
    // patch usize in BOTH headers of the stored member (LFH +22, CD +24)
    lie(22) = (lie(22) + 1).toByte
    lie(cd + 24) = (lie(cd + 24) + 1).toByte
    val pl = ZipProbe.probe(lie)
    assert(pl.isEmpty || ZipProbe.extract(lie, pl.get.entries.head).isEmpty)
    assert(inf0.nEntries == 2)
  }
}
