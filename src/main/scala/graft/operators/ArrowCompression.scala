package graft.operators

import org.apache.arrow.memory.{ArrowBuf, BufferAllocator}
import org.apache.arrow.vector.compression.{AbstractCompressionCodec, CompressionCodec, CompressionUtil}

/** Arrow record-batch body compression with a FAST LZ4 leg.
  *
  * Arrow Java's stock `CommonsCompressionFactory` backs LZ4_FRAME with
  * commons-compress — a pure-Java encoder that builds its match-finder
  * state per stream instance: measured 3.2 ms per ~200-byte batch on this
  * repo's q273 shape (16.1 s for 5000 single-threaded rows, vs 0.13 ms
  * for zstd-jni — the entire q273 cold-path residual after the round-14
  * buffer pooling). This factory swaps in lz4-java (JNI, shipped with
  * Spark) for LZ4_FRAME while keeping the stock codec for ZSTD
  * (zstd-jni, already native). Both emit the public LZ4 FRAME format
  * (the Arrow spec's codec), so files stay readable by any conformant
  * reader — `ArrowIpcSpec` decodes them with commons-compress.
  *
  * `doCompress` honors the [[AbstractCompressionCodec]] contract: 8 bytes
  * reserved at the buffer head for the uncompressed-length prefix the
  * base class writes (or the -1 stored-raw escape when compression does
  * not pay).
  */
object ArrowCompression {

  /** 64 KiB blocks: the payloads here are batch buffers (bytes–KBs); the
    * lz4-java default 4 MiB block would allocate a 4 MiB scratch buffer
    * per stream instance — per ROW on the synth paths.
    */
  private val Block =
    net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB

  final class FastLz4Codec extends AbstractCompressionCodec {
    override def getCodecType: CompressionUtil.CodecType =
      CompressionUtil.CodecType.LZ4_FRAME

    override protected def doCompress(allocator: BufferAllocator,
        uncompressed: ArrowBuf): ArrowBuf = {
      val len = uncompressed.writerIndex().toInt
      val src = new Array[Byte](len)
      uncompressed.getBytes(0, src)
      val bos = new java.io.ByteArrayOutputStream(len max 64)
      val os = new net.jpountz.lz4.LZ4FrameOutputStream(bos, Block)
      os.write(src)
      os.close()
      val compressed = bos.toByteArray
      val buf = allocator.buffer(8L + compressed.length)
      buf.setBytes(8L, compressed)
      buf.writerIndex(8L + compressed.length)
      buf
    }

    override protected def doDecompress(allocator: BufferAllocator,
        compressed: ArrowBuf): ArrowBuf = {
      val ulen = readUncompressedLength(compressed)
      val len = (compressed.writerIndex() - 8L).toInt
      val src = new Array[Byte](len)
      compressed.getBytes(8L, src)
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(src))
      val out = new Array[Byte](ulen.toInt)
      var done = 0
      var r = in.read(out, 0, out.length)
      while (r > 0) {
        done += r
        r = if (done < out.length) in.read(out, done, out.length - done)
        else in.read()
      }
      in.close()
      require(done == ulen && r == -1,
        s"lz4 frame decoded $done bytes, declared $ulen")
      val buf = allocator.buffer(ulen)
      buf.setBytes(0, out)
      buf.writerIndex(ulen)
      buf
    }
  }

  /** LZ4_FRAME via lz4-java; everything else (ZSTD) via the stock
    * commons factory.
    */
  object Factory extends CompressionCodec.Factory {
    override def createCodec(
        t: CompressionUtil.CodecType): CompressionCodec = t match {
      case CompressionUtil.CodecType.LZ4_FRAME => new FastLz4Codec
      case other =>
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE
          .createCodec(other)
    }

    override def createCodec(t: CompressionUtil.CodecType,
        level: Int): CompressionCodec = t match {
      case CompressionUtil.CodecType.LZ4_FRAME => new FastLz4Codec
      case other =>
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE
          .createCodec(other, level)
    }
  }
}
