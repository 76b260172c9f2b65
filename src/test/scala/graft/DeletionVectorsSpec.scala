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

  test("iceberg v3 DV blob framing: BE length + magic + bitmap + CRC-32") {
    val ps = Array(1L, 4L, 7L, 70000L)
    val blob = DeletionVectors.serializeDvBlob(ps)
    val bare = DeletionVectors.serializeRoaring64(ps)
    assert(blob.length == bare.length + 12)
    // BE length prefix covers magic + bitmap
    val len = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    assert(len == bare.length + 4)
    assert((blob(4) & 0xff, blob(5) & 0xff, blob(6) & 0xff, blob(7) & 0xff) ==
      ((0xD1, 0xD3, 0x39, 0x64)))
    assert(blob.slice(8, 8 + bare.length).sameElements(bare))
    assert(DeletionVectors.deserializeDvBlob(blob).get.toSeq == ps.toSeq)
    // a bare bitmap is NOT a framed blob and vice versa
    assert(DeletionVectors.deserializeDvBlob(bare).isEmpty)
    assert(DeletionVectors.deserializeRoaring64(blob).isEmpty)
    // empty DV frames to 24 bytes (12-byte bitmap + 12-byte envelope)
    val empty = DeletionVectors.serializeDvBlob(Array.empty[Long])
    assert(empty.length == 24)
    assert(DeletionVectors.deserializeDvBlob(empty).get.isEmpty)
    // every single-byte corruption declines or decodes consistently,
    // never throws; CRC catches any flip in the bitmap body
    blob.indices.foreach { i =>
      val c = blob.clone(); c(i) = (c(i) ^ 0x55).toByte
      assert(DeletionVectors.deserializeDvBlob(c).isEmpty, s"byte $i")
    }
    (1 until blob.length).foreach(k =>
      assert(DeletionVectors.deserializeDvBlob(blob.dropRight(k)).isEmpty))
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
