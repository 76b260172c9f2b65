package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DeletionVectors
import graft.operators.DeletionVectors.{DvDescriptor, Z85}

class DeletionVectorsSpec extends AnyFunSuite {

  test("Z85: RFC 32 reference vector, alignment and alphabet contracts") {
    // the RFC 32 test case: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    val hello = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(Z85.encode(hello) == "HelloWorld")
    assert(Z85.decode("HelloWorld").get.sameElements(hello))
    intercept[IllegalArgumentException](Z85.encode(Array[Byte](1, 2, 3)))
    assert(Z85.decode("abcd").isEmpty)      // not 5-aligned
    assert(Z85.decode("abc~d").isEmpty)     // char outside the alphabet
    assert(Z85.decode("#####").isEmpty)     // 85^5-1 overflows 32 bits
    assert(Z85.decode("").get.isEmpty)
  }

  test("roaring64 roundtrips: array, bitmap, multi-key, dups, empty") {
    def rt(ps: Array[Long]): Unit = {
      val got = DeletionVectors.deserializeRoaring64(
        DeletionVectors.serializeRoaring64(ps)).get
      assert(got.toSeq == ps.distinct.sorted.toSeq, s"n=${ps.length}")
    }
    rt(Array.empty[Long])
    rt(Array(0L))
    rt(Array(5L, 1L, 5L, 99999L))                    // dups + two containers
    rt(Array.tabulate(5000)(i => i * 2L))            // bitmap container (>4096)
    rt(Array(3L, (1L << 32) | 7L, (5L << 32) | 1L))  // multi-key
    rt(Array.tabulate(4096)(_.toLong))               // array-container boundary
    rt(Array.tabulate(4097)(_.toLong))               // just past it
  }

  test("inline descriptor: wire roundtrip, honest size, lying fields reject") {
    val ps = Array.tabulate(89)(i => (i * 7 + 3).toLong)
    val d = DeletionVectors.encodeInline(ps)
    assert(d.storageType == "i")
    // single key, single array container: 4+8+4 + 4+4+4+4 + 2*|DV|
    assert(d.sizeInBytes == 32 + 2 * ps.length)
    assert(d.cardinality == ps.length.toLong)
    assert(d.pathOrInlineDv.length % 5 == 0)
    assert(DeletionVectors.decodeInline(d).get.toSeq == ps.toSeq)
    // the descriptor's claims are enforced, not trusted
    assert(DeletionVectors.decodeInline(d.copy(cardinality = 88L)).isEmpty)
    assert(DeletionVectors.decodeInline(d.copy(sizeInBytes = 10)).isEmpty)
    assert(DeletionVectors.decodeInline(
      d.copy(sizeInBytes = d.sizeInBytes + 8)).isEmpty)
    assert(DeletionVectors.decodeInline(d.copy(storageType = "p")).isEmpty)
    assert(DeletionVectors.decodeInline(d.copy(pathOrInlineDv = "bad")).isEmpty)
  }

  test("hostile bytes: every single-byte corruption decodes to None or a " +
    "DIFFERENT valid set, never a throw; truncations reject") {
    val ps = Array(1L, 40L, 70000L, (2L << 32) | 5L)
    val blob = DeletionVectors.serializeRoaring64(ps)
    (blob.indices by 1).foreach { i =>
      val c = blob.clone(); c(i) = (c(i) ^ 0x55).toByte
      DeletionVectors.deserializeRoaring64(c) // must not throw
    }
    (1 until blob.length).foreach { k =>
      assert(DeletionVectors.deserializeRoaring64(blob.dropRight(k)).isEmpty)
      }
    assert(DeletionVectors.deserializeRoaring64(
      blob ++ Array[Byte](0)).isEmpty) // trailing garbage rejects
    // foreign cookie (a run-container file) rejects
    val run = blob.clone()
    // bitmap payload starts at 16 (magic 4 + count 8 + key 4): cookie LE
    run(16) = (12347 & 0xff).toByte; run(17) = ((12347 >> 8) & 0xff).toByte
    assert(DeletionVectors.deserializeRoaring64(run).isEmpty)
  }
}
