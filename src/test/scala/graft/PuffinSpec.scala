package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Puffin

class PuffinSpec extends AnyFunSuite {

  private def manual(json: String, dataLen: Int, flags: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("PFA1".getBytes("UTF-8"))
    out.write(new Array[Byte](dataLen))
    out.write("PFA1".getBytes("UTF-8"))
    val p = json.getBytes("UTF-8")
    out.write(p)
    val n = p.length
    out.write(n & 0xff); out.write((n >>> 8) & 0xff)
    out.write((n >>> 16) & 0xff); out.write((n >>> 24) & 0xff)
    out.write(flags); out.write(0); out.write(0); out.write(0)
    out.write("PFA1".getBytes("UTF-8"))
    out.toByteArray
  }

  test("write/probe roundtrip: plain and lz4-frame footers, blob fetch") {
    val b1 = Array[Byte](1, 2, 3, 4, 5)
    val b2 = Array[Byte](9, 8)
    for (gz <- Seq(false, true)) {
      val f = Puffin.write(Seq("t-one" -> b1, "t-two" -> b2),
        snapshotId = 42L, sequenceNumber = 7L,
        properties = Map("created-by" -> "graft"), compressFooter = gz)
      val p = Puffin.probe(f).get
      assert(p.compressedFooter == gz)
      assert(p.properties == Map("created-by" -> "graft"))
      assert(p.blobs.map(m => (m.blobType, m.offset, m.length,
        m.snapshotId, m.sequenceNumber)) ==
        Vector(("t-one", 4L, 5L, 42L, 7L), ("t-two", 9L, 2L, 42L, 7L)))
      assert(Puffin.blobBytes(f, p.blobs(0)).sameElements(b1))
      assert(Puffin.blobBytes(f, p.blobs(1)).sameElements(b2))
    }
    // empty blob list is legal
    val e = Puffin.write(Nil, 0L, 0L, Map.empty, compressFooter = false)
    assert(Puffin.probe(e).get.blobs.isEmpty)
  }

  test("lz4 footer frame declares content size (FLG content-size bit set)") {
    // puffin-spec: the lz4 footer codec is a single LZ4 frame "with content
    // size present". With no blobs the frame starts right after the second
    // magic: [PFA1][PFA1][frame...]. LZ4 frame = magic 04 22 4D 18, then FLG
    // whose bit 3 (0x08) is the content-size flag.
    val f = Puffin.write(Nil, 0L, 0L, Map("k" -> "v"), compressFooter = true)
    assert((f(8) & 0xff) == 0x04 && (f(9) & 0xff) == 0x22 &&
      (f(10) & 0xff) == 0x4d && (f(11) & 0xff) == 0x18, "LZ4 frame magic")
    assert((f(12) & 0x08) != 0, "FLG content-size bit must be set")
    // and the declared size (8 bytes after FLG+BD) matches the payload
    val p = Puffin.probe(f).get
    assert(p.compressedFooter && p.properties == Map("k" -> "v"))
  }

  test("coherence: overlaps, region escapes, foreign flags, bad JSON reject") {
    def blobsJson(entries: String): String =
      s"""{"blobs":[$entries],"properties":{}}"""
    def entry(off: Int, len: Int): String =
      s"""{"type":"t","fields":[1],"snapshot-id":1,"sequence-number":1,"offset":$off,"length":$len}"""
    // 16 data bytes: region is [4, 20)
    assert(Puffin.probe(manual(blobsJson(entry(4, 16)), 16, 0)).nonEmpty)
    assert(Puffin.probe(manual(blobsJson(entry(4, 17)), 16, 0)).isEmpty) // escape
    assert(Puffin.probe(manual(blobsJson(entry(3, 2)), 16, 0)).isEmpty)  // in magic
    assert(Puffin.probe(manual( // overlap
      blobsJson(entry(4, 10) + "," + entry(8, 4)), 16, 0)).isEmpty)
    assert(Puffin.probe(manual(blobsJson(entry(4, 4)), 16, 2)).isEmpty)  // flag bit 1
    // Long-overflow offsets/lengths must not wrap past the bounds guard:
    // offset + length overflows negative, which an addition-form check
    // would wave through and blobBytes would then throw on
    def entryL(off: Long, len: Long): String =
      s"""{"type":"t","fields":[1],"snapshot-id":1,"sequence-number":1,"offset":$off,"length":$len}"""
    assert(Puffin.probe(manual(
      blobsJson(entryL(4L, Long.MaxValue)), 16, 0)).isEmpty)
    assert(Puffin.probe(manual(
      blobsJson(entryL(Long.MaxValue, 8L)), 16, 0)).isEmpty)
    assert(Puffin.probe(manual( // overlap check must not wrap either
      blobsJson(entryL(4L, Long.MaxValue) + "," + entryL(8L, 4L)),
      16, 0)).isEmpty)
    assert(Puffin.probe(manual("""[1,2]""", 16, 0)).isEmpty)             // not object
    assert(Puffin.probe(manual(
      """{"blobs":[{"fields":[1],"offset":4,"length":2}],"properties":{}}""",
      16, 0)).isEmpty)                                                   // no type
  }

  test("hostile bytes: corruption never throws; truncations reject") {
    val f = Puffin.write(Seq("t" -> Array[Byte](1, 2, 3)), 1L, 1L,
      Map("k" -> "v"), compressFooter = true)
    f.indices.foreach { i =>
      val c = f.clone(); c(i) = (c(i) ^ 0x55).toByte
      Puffin.probe(c) // any result, never a throw
    }
    (1 until f.length).foreach(k => assert(Puffin.probe(f.dropRight(k)).isEmpty))
    assert(Puffin.probe(Array.empty[Byte]).isEmpty)
  }
}
