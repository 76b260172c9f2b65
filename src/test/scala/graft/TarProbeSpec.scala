package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TarProbe

/** TAR/ustar walk: checksum verification, octal decode, block
  * geometry, the WebDataset sample grouping, and the hostile sweep.
  */
class TarProbeSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("ISO-8859-1")

  private def shard() = TarProbe.synth(Seq(
    ("s0.txt", bytes("caption zero")),
    ("s0.cls", bytes("7")),
    ("s1.txt", bytes("x" * 513)), // spans two data blocks
    ("s1.cls", bytes("3"))), dirs = Seq("data/"))

  test("round trip: members, checksums, sample grouping, geometry") {
    val b = shard()
    val t = TarProbe.probe(b).get
    assert(t.nMembers == 5)
    assert(t.members.head.typeflag == '5' && t.members.head.name == "data/")
    assert(t.members.map(_.name) ==
      Vector("data/", "s0.txt", "s0.cls", "s1.txt", "s1.cls"))
    assert(t.nSamples == 2) // s0 + s1, the dir excluded
    assert(t.totalSize == 12 + 1 + 513 + 1)
    assert(new String(TarProbe.content(b, t.members(1)), "ISO-8859-1") ==
      "caption zero")
    // geometry: dir 512 + 4 x (512 hdr + data blocks) + 1024 terminator
    assert(b.length == 512 + (512 + 512) + (512 + 512) +
      (512 + 1024) + (512 + 512) + 1024)
    assert(t.members.forall(_.mtime == 1577836800L))
  }

  test("ustar prefix rule joins long paths") {
    // hand-build: take a normal member and move its directory into the
    // prefix field
    val b = TarProbe.synth(Seq(("file.txt", bytes("hi"))))
    val c = b.clone()
    // write prefix "deep/dir" at 345 and fix the checksum
    "deep/dir".getBytes("ISO-8859-1").zipWithIndex.foreach { case (ch, i) =>
      c(345 + i) = ch
    }
    (148 until 156).foreach(i => c(i) = ' ')
    val sum = (0 until 512).map(i => c(i) & 0xff).sum
    ("%06o".format(sum) + "  ").getBytes("ISO-8859-1").zipWithIndex
      .foreach { case (ch, i) => c(148 + i) = ch }
    assert(TarProbe.probe(c).get.members.head.name == "deep/dir/file.txt")
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = shard()
    assert(TarProbe.probe(Array.emptyByteArray).isEmpty)
    assert(TarProbe.probe(new Array[Byte](512)).isEmpty) // lone zero block
    assert(TarProbe.probe(b.dropRight(1)).isEmpty) // not block-aligned
    assert(TarProbe.probe(b.dropRight(512)).isEmpty) // one terminator block
    def mut(f: Array[Byte] => Unit): Option[TarProbe.TarInfo] = {
      val c = b.clone(); f(c); TarProbe.probe(c)
    }
    assert(mut(_(257) = 'U'.toByte).isEmpty) // magic case-sensitive
    assert(mut(_(0) = (b(0) ^ 1).toByte).isEmpty) // name flip -> checksum
    assert(mut(_(124 + 512) = '9'.toByte).isEmpty) // non-octal size digit
    assert(mut(_(156 + 512) = 'L'.toByte).isEmpty) // GNU long-name declined
    assert(mut(_(156 + 512) = '2'.toByte).isEmpty) // symlink declined
    // nonzero pad byte after a member's data
    val padAt = 512 + 512 + 12 // dir block, s0.txt header, end of content
    assert(mut(_(padAt + 100) = 1).isEmpty)
    // garbage after the two-zero-block terminator
    assert(TarProbe.probe(b ++ new Array[Byte](511) ++ Array[Byte](1)).isEmpty)
    // extra zero blocks after the terminator are fine (blocking padding)
    assert(TarProbe.probe(b ++ new Array[Byte](1024)).isDefined)
    // a declared size overrunning the archive
    assert(mut { c =>
      // s1.txt's header starts after dir + 2 members (each 1024)
      val h = 512 + 1024 + 1024
      c(h + 124) = '7'.toByte
      (148 until 156).foreach(i => c(h + i) = ' ')
      val sum = (h until h + 512).map(i => c(i) & 0xff).sum
      ("%06o".format(sum) + "  ").getBytes("ISO-8859-1").zipWithIndex
        .foreach { case (ch, i) => c(h + 148 + i) = ch }
    }.isEmpty)
  }

  test("synth rejects out-of-contract names eagerly") {
    intercept[IllegalArgumentException](TarProbe.synth(Seq(("", bytes("x")))))
    intercept[IllegalArgumentException](
      TarProbe.synth(Seq(("y" * 101, bytes("x")))))
  }

  test("PAX extended headers: path/mtime/size overrides applied") {
    import TarProbe.SynthEntry
    val longName = "deep/" * 30 + "payload.txt" // 161 chars, needs PAX
    val b = TarProbe.synthLongForm(Seq(
      SynthEntry("plain.txt", bytes("aa")),
      SynthEntry(longName, bytes("pax body"), mech = 'x', paxMtime = 1700000000L),
      SynthEntry("sized.bin", bytes("12345"), mech = 'x', paxSizeRecord = true)))
    val t = TarProbe.probe(b).get
    assert(t.nMembers == 3) // 'x' headers are meta, not members
    assert(t.members(0).via == "ustar" && t.members(0).nPaxRecords == 0)
    val m1 = t.members(1)
    assert(m1.name == longName && m1.via == "pax")
    assert(m1.mtime == 1700000000L && m1.nPaxRecords == 2)
    assert(new String(TarProbe.content(b, m1), "ISO-8859-1") == "pax body")
    val m2 = t.members(2)
    // octal field says 0; the PAX size record carries the truth
    assert(m2.size == 5 && m2.via == "pax" && m2.nPaxRecords == 2)
    assert(new String(TarProbe.content(b, m2), "ISO-8859-1") == "12345")
  }

  test("PAX record length is self-referential (counts its own digits)") {
    // "25 path=0123456789abcdef\n" -> 25 == 2 digits + 23 tail
    val r = new String(TarProbe.paxRecordBytes("path", "0123456789abcdef"),
      "UTF-8")
    assert(r == "25 path=0123456789abcdef\n")
    assert(r.length == 25)
    // the digit-count skip: base 98 ("path" + 91 chars) admits neither
    // LEN 99 (2 digits) nor LEN 100 (3 digits reach 101) — the smallest
    // self-consistent length is 101
    val r2 = new String(TarProbe.paxRecordBytes("path", "z" * 91), "UTF-8")
    assert(r2.length == 101 && r2.startsWith("101 path="))
  }

  test("PAX fractional mtime truncates; non-decimal values reject") {
    // hand-build a pax+member archive with an arbitrary mtime value:
    // synth a plain archive whose first member holds the records, then
    // flip its typeflag to 'x' and re-checksum
    def paxArchive(mtimeValue: String): Array[Byte] = {
      val recs = TarProbe.paxRecordBytes("path", "f.txt") ++
        TarProbe.paxRecordBytes("mtime", mtimeValue)
      val c = TarProbe.synth(Seq(("PaxHeaders/x0", recs), ("f.txt", bytes("hi"))))
      c(156) = 'x'.toByte
      (148 until 156).foreach(i => c(i) = ' ')
      val sum = (0 until 512).map(i => c(i) & 0xff).sum
      ("%06o".format(sum) + "  ").getBytes("ISO-8859-1").zipWithIndex
        .foreach { case (ch, i) => c(148 + i) = ch }
      c
    }
    val t = TarProbe.probe(paxArchive("42.125")).get
    assert(t.members.head.mtime == 42L) // fraction truncated
    assert(t.members.head.name == "f.txt" && t.members.head.via == "pax")
    assert(TarProbe.probe(paxArchive("42.1b5")).isEmpty) // non-digit fraction
    assert(TarProbe.probe(paxArchive("4x2")).isEmpty) // non-decimal seconds
  }

  test("GNU long-name members walk; stacking and dangling reject") {
    import TarProbe.SynthEntry
    val longName = "gnu/" * 30 + "file.bin" // 128 chars
    val b = TarProbe.synthLongForm(Seq(
      SynthEntry(longName, bytes("gnu content"), mech = 'L'),
      SynthEntry("after.txt", bytes("x"))))
    val t = TarProbe.probe(b).get
    assert(t.nMembers == 2)
    assert(t.members.head.name == longName && t.members.head.via == "gnuL")
    assert(new String(TarProbe.content(b, t.members.head), "ISO-8859-1") ==
      "gnu content")
    assert(t.members(1).via == "ustar")
    // dangling 'L' header (no member follows): drop the member+terminator,
    // re-terminate after the L header
    val lSpan = 512 + 512 // L header + its 1-block data
    val dangling = b.take(lSpan) ++ new Array[Byte](1024)
    assert(TarProbe.probe(dangling).isEmpty)
  }

  test("hostile long-form bytes: malformed PAX records reject") {
    import TarProbe.SynthEntry
    val b = TarProbe.synthLongForm(Seq(
      SynthEntry("p" * 120, bytes("body"), mech = 'x')))
    def mutPax(f: Array[Byte] => Unit): Option[TarProbe.TarInfo] = {
      val c = b.clone(); f(c)
      // re-checksum the pax header (block 0) after mutating its data is
      // not needed: records live in the DATA blocks (block 1)
      TarProbe.probe(c)
    }
    val dataAt = 512 // pax records start after the 'x' header block
    assert(TarProbe.probe(b).isDefined)
    assert(mutPax(_(dataAt) = 'x'.toByte).isEmpty) // LEN not decimal
    assert(mutPax(_(dataAt + 2) = '_'.toByte).isEmpty) // no space after LEN
    // newline at the declared end replaced -> record does not tile
    val recLen = new String(b.slice(dataAt, dataAt + 3), "UTF-8").takeWhile(_.isDigit).toInt
    assert(mutPax(_(dataAt + recLen - 1) = '!'.toByte).isEmpty)
    // two stacked 'x' headers: build pax+pax+member by splicing the
    // first 'x' header + data in front of the whole archive
    val paxSpan = 512 + 512
    assert(TarProbe.probe(b.take(paxSpan) ++ b).isEmpty)
  }
}
