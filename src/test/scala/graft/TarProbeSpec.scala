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
}
