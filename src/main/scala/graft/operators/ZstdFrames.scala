package graft.operators

import scala.util.control.NonFatal

/** ZSTD FRAME walk (RFC 8878, the public Zstandard spec): the one
  * modern codec this engine reads through Spark's native scan
  * (parquet+zstd, q223) but could not introspect at the byte level —
  * now the frame layer is real: magic, the frame-header descriptor
  * (content-size/checksum/dictionary flags, single-segment), window
  * descriptor, the four frame-content-size widths with the +256 bias
  * on the 2-byte form, skippable frames (magic 0x184D2A5x + u32
  * size), and the BLOCK walk (3-byte little-endian headers:
  * last/type/size).
  *
  * Decode posture, honest about what the JDK can do: RAW (stored) and
  * RLE blocks are decoded for real — a zstd file holding only those
  * is fully valid and fully reconstructed here, and the optional
  * content checksum (the LOW 32 BITS of XXH64(content, seed 0) — via
  * Spark's own XXH64, the same public algorithm) is then VERIFIED.
  * Compressed blocks (FSE/Huffman) are walked by their declared sizes
  * — the frame still tiles, sizes still report — but content decode
  * is an explicit decline (`decodedBytes = None`), the
  * [[MpegFrames]]-PCM posture: never fabricate what you cannot
  * verify.
  *
  * Hostile-byte posture: [[probe]] never throws. A wrong magic, a
  * reserved descriptor bit, a reserved block type, a block or frame
  * overrunning the input, a declared content size disagreeing with
  * the decoded bytes, or a failed checksum all yield None.
  */
object ZstdFrames {

  final case class ZstdFrame(contentSizeDeclared: Option[Long],
      windowDescriptor: Option[Int], dictId: Option[Long],
      hasChecksum: Boolean, nBlocks: Int, compressedBlockBytes: Long,
      decodedBytes: Option[Long], decodedText: Option[String])

  final case class ZstdInfo(frames: Vector[ZstdFrame], nSkippable: Int,
      skippableBytes: Long) {
    def nFrames: Int = frames.length
  }

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** The low 32 bits of XXH64(content, seed 0) — zstd's content
    * checksum, computed by Spark's own XXH64 implementation.
    */
  def contentChecksum(content: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      content, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      content.length, 0L) & 0xffffffffL

  /** Walk a whole .zst image: data and skippable frames back to back. */
  def probe(b: Array[Byte]): Option[ZstdInfo] =
    try {
      var p = 0
      val frames = Vector.newBuilder[ZstdFrame]
      var nSkip = 0
      var skipBytes = 0L
      var any = false
      while (p < b.length) {
        if (p + 4 > b.length) return None
        val magic = le32(b, p)
        if ((magic & 0xfffffff0L) == 0x184d2a50L) {
          // skippable frame: u32 size + payload, never decoded
          if (p + 8 > b.length) return None
          val sz = le32(b, p + 4)
          if (sz > b.length - p - 8) return None
          nSkip += 1
          skipBytes += sz
          p += 8 + sz.toInt
          any = true
        } else if (magic == 0xfd2fb528L) {
          p += 4
          if (p >= b.length) return None
          val fhd = b(p) & 0xff
          p += 1
          if ((fhd & 0x08) != 0) return None // reserved bit
          val fcsFlag = (fhd >> 6) & 3
          val singleSegment = (fhd & 0x20) != 0
          val hasChecksum = (fhd & 0x04) != 0
          val didFlag = fhd & 3
          val window: Option[Int] =
            if (singleSegment) None
            else {
              if (p >= b.length) return None
              val w = b(p) & 0xff; p += 1; Some(w)
            }
          val didLen = Seq(0, 1, 2, 4)(didFlag)
          if (p + didLen > b.length) return None
          val dictId: Option[Long] =
            if (didLen == 0) None
            else Some((0 until didLen).foldLeft(0L)((a, i) =>
              a | (b(p + i) & 0xffL) << (8 * i)))
          p += didLen
          val fcsLen = fcsFlag match {
            case 0 => if (singleSegment) 1 else 0
            case 1 => 2
            case 2 => 4
            case _ => 8
          }
          if (p + fcsLen > b.length) return None
          val contentSize: Option[Long] = fcsLen match {
            case 0 => None
            case 1 => Some(b(p) & 0xffL)
            case 2 => Some(((b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8)) + 256)
            case n => Some((0 until n).foldLeft(0L)((a, i) =>
              a | (b(p + i) & 0xffL) << (8 * i)))
          }
          p += fcsLen
          // block walk
          val content = new java.io.ByteArrayOutputStream()
          var decodable = true
          var nBlocks = 0
          var compBytes = 0L
          var last = false
          while (!last) {
            if (p + 3 > b.length) return None
            val h = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
              ((b(p + 2) & 0xff) << 16)
            p += 3
            last = (h & 1) == 1
            val btype = (h >> 1) & 3
            val bsize = h >>> 3
            nBlocks += 1
            btype match {
              case 0 => // raw: stored bytes
                if (bsize > b.length - p) return None
                if (decodable) content.write(b, p, bsize)
                p += bsize
              case 1 => // RLE: ONE byte, repeated bsize times
                if (p >= b.length) return None
                if (decodable)
                  (0 until bsize).foreach(_ => content.write(b(p)))
                p += 1
              case 2 => // compressed: walk by size, decline decode
                if (bsize > b.length - p) return None
                compBytes += bsize
                decodable = false
                p += bsize
              case _ => return None // reserved block type
            }
            if (content.size() > (64 << 20)) return None // bomb guard
          }
          val decoded = if (decodable) Some(content.toByteArray) else None
          decoded.foreach { d =>
            contentSize.foreach(cs => if (cs != d.length) return None)
          }
          if (hasChecksum) {
            if (p + 4 > b.length) return None
            val want = le32(b, p)
            p += 4
            decoded.foreach { d =>
              if (contentChecksum(d) != want) return None
            }
          }
          frames += ZstdFrame(contentSize, window, dictId, hasChecksum,
            nBlocks, compBytes, decoded.map(_.length.toLong),
            decoded.map(new String(_, "UTF-8")))
          any = true
        } else return None
      }
      if (!any) return None
      Some(ZstdInfo(frames.result(), nSkip, skipBytes))
    } catch { case NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format, true checksums.
  // ------------------------------------------------------------------

  /** One synthetic data frame from `content`: split into raw blocks of
    * ≤ `rawBlock` bytes with an optional leading RLE run, the declared
    * content size in its narrowest legal width, a real XXH64 content
    * checksum when `withChecksum`.
    */
  def synthFrame(content: Array[Byte], rleRun: Int, rleByte: Byte,
      rawBlock: Int, withChecksum: Boolean): Array[Byte] = {
    require(rawBlock > 0)
    val full = Array.fill(rleRun)(rleByte) ++ content
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    w32(0xfd2fb528L)
    val total = full.length.toLong
    // narrowest content-size form: single-segment 1-byte for < 256,
    // else the 2-byte biased form for < 65792, else 4-byte
    val (fcsFlag, singleSegment) =
      if (total < 256) (0, true)
      else if (total >= 256 && total < 65536 + 256) (1, false)
      else (2, false)
    val fhd = (fcsFlag << 6) | (if (singleSegment) 0x20 else 0) |
      (if (withChecksum) 0x04 else 0)
    out.write(fhd)
    if (!singleSegment) out.write(0x58) // window descriptor: 16 MiB-ish
    fcsFlag match {
      case 0 => out.write(total.toInt)
      case 1 =>
        val v = total - 256
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      case _ => w32(total)
    }
    // blocks: optional RLE first, then raw slices
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    if (rleRun > 0) blocks += ((1, Array(rleByte)))
    var at = 0
    while (at < content.length) {
      val n = math.min(rawBlock, content.length - at)
      blocks += ((0, java.util.Arrays.copyOfRange(content, at, at + n)))
      at += n
    }
    if (blocks.isEmpty) blocks += ((0, Array.emptyByteArray))
    blocks.zipWithIndex.foreach { case ((btype, data), i) =>
      val isLast = i == blocks.length - 1
      val bsize = if (btype == 1) rleRun else data.length
      val h = (bsize << 3) | (btype << 1) | (if (isLast) 1 else 0)
      out.write(h & 0xff); out.write((h >> 8) & 0xff); out.write((h >> 16) & 0xff)
      out.write(data, 0, data.length)
    }
    if (withChecksum) w32(contentChecksum(full))
    out.toByteArray
  }

  /** A skippable frame with `len` payload bytes. */
  def synthSkippable(len: Int, fill: Int => Int, nibble: Int = 0): Array[Byte] = {
    require(nibble >= 0 && nibble <= 15)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    w32(0x184d2a50L | nibble)
    w32(len.toLong)
    (0 until len).foreach(i => out.write(fill(i) & 0xff))
    out.toByteArray
  }
}
