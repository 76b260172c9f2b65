package graft.operators

import scala.util.control.NonFatal

/** PARQUET DATA-PAGE decode — the value-level half of the pure-JVM
  * parquet read path ([[ParquetFooter]] is the metadata half): page
  * headers (Thrift compact `PageHeader`), SNAPPY / UNCOMPRESSED page
  * decompression (snappy via the `snappy-java` library Spark already
  * ships), v1 data pages with RLE/bit-packed-hybrid definition levels,
  * and both value encodings that cover real writers' flat columns —
  * PLAIN (fixed-width INT32/INT64 little-endian, length-prefixed
  * BYTE_ARRAY) and RLE_DICTIONARY / PLAIN_DICTIONARY (a PLAIN-encoded
  * dictionary page + bit-width-prefixed RLE index runs, including the
  * writer's mid-chunk fallback from dictionary to PLAIN pages when
  * the dictionary overflows). All layouts are from the public
  * parquet-format spec.
  *
  * Scope: flat optional columns (max definition level 1, no
  * repetition levels) of physical types INT32, INT64, and BYTE_ARRAY
  * — the shape every column of a flat table has. Nested columns,
  * v2 data pages, and other codecs (GZIP/ZSTD/LZ4) reject rather
  * than mis-decode.
  *
  * Hostile-byte posture: [[readColumn]] never throws — a malformed
  * page header, an unknown codec/encoding, a dictionary index out of
  * range, an RLE run overrunning its section, or a page not yielding
  * its declared value count all yield None.
  */
object ParquetPages {

  sealed trait PValue
  final case class PLong(v: Long) extends PValue
  final case class PBin(v: Array[Byte]) extends PValue {
    def str: String = new String(v, "UTF-8")
  }

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  /** RLE/bit-packed hybrid decode: `count` values of `bitWidth` bits
    * from b[from, to). Runs may overshoot `count` via bit-packed
    * group padding; excess values are discarded per the spec.
    */
  private def rleHybrid(b: Array[Byte], from: Int, to: Int, bitWidth: Int,
      count: Int): Array[Int] = {
    val out = new Array[Int](count)
    var n = 0
    var p = from
    def u8(): Int = { if (p >= to) fail(); val v = b(p) & 0xff; p += 1; v }
    def varint(): Long = {
      var v = 0L; var sh = 0
      while (true) {
        val c = u8()
        v |= (c & 0x7fL) << sh
        if ((c & 0x80) == 0) return v
        sh += 7
        if (sh > 35) fail()
      }
      0L
    }
    if (bitWidth == 0) return out // all zeros, no bytes consumed
    val byteW = (bitWidth + 7) / 8
    while (n < count) {
      val h = varint()
      if ((h & 1) == 0) {
        // RLE run: value in ceil(bw/8) bytes little-endian
        val len = (h >>> 1).toInt
        if (len < 0) fail()
        var v = 0
        (0 until byteW).foreach(i => v |= u8() << (8 * i))
        val take = math.min(len, count - n)
        java.util.Arrays.fill(out, n, n + take, v)
        n += take
        if (take < len) fail() // an RLE run may not overshoot count
      } else {
        // bit-packed: (h>>>1) groups of 8 values, LSB-first packing
        val groups = (h >>> 1).toInt
        if (groups <= 0) fail()
        var acc = 0L
        var accBits = 0
        var i = 0
        val total = groups * 8
        while (i < total) {
          while (accBits < bitWidth) {
            acc |= u8().toLong << accBits
            accBits += 8
          }
          val v = (acc & ((1L << bitWidth) - 1)).toInt
          acc >>>= bitWidth
          accBits -= bitWidth
          if (n < count) { out(n) = v; n += 1 }
          i += 1
        }
      }
    }
    out
  }

  private def decompress(codec: Int, raw: Array[Byte],
      uncompressedSize: Int): Array[Byte] = codec match {
    case 0 => raw // UNCOMPRESSED
    case 1 =>
      val out = org.xerial.snappy.Snappy.uncompress(raw)
      if (out.length != uncompressedSize) fail()
      out
    case _ => fail() // GZIP/ZSTD/...: explicit declines
  }

  private def plainValues(ptype: Int, b: Array[Byte], from: Int, to: Int,
      count: Int): Vector[PValue] = {
    var p = from
    val out = Vector.newBuilder[PValue]
    def need(k: Int): Unit = if (p + k > to) fail()
    (0 until count).foreach { _ =>
      ptype match {
        case 1 => // INT32 little-endian
          need(4)
          var v = 0L
          (0 until 4).foreach(i => v |= (b(p + i) & 0xffL) << (8 * i))
          out += PLong(v.toInt.toLong)
          p += 4
        case 2 => // INT64 little-endian
          need(8)
          var v = 0L
          (0 until 8).foreach(i => v |= (b(p + i) & 0xffL) << (8 * i))
          out += PLong(v)
          p += 8
        case 6 => // BYTE_ARRAY: u32 LE length + bytes
          need(4)
          var len = 0
          (0 until 4).foreach(i => len |= (b(p + i) & 0xff) << (8 * i))
          p += 4
          if (len < 0) fail()
          need(len)
          out += PBin(java.util.Arrays.copyOfRange(b, p, p + len))
          p += len
        case _ => fail() // BOOLEAN/FLOAT/FA: out of scope here
      }
    }
    if (p > to) fail()
    out.result()
  }

  /** Decode one flat optional column chunk of `file` described by
    * `chunk` (from [[ParquetFooter.probe]]'s first row group).
    * Returns the column's values in row order, None slots for nulls.
    */
  def readColumn(file: Array[Byte], chunk: ParquetFooter.ChunkInfo)
      : Option[Vector[Option[PValue]]] =
    try {
      if (chunk.dataPageOffset < 0 || chunk.numValues < 0) return None
      val start = chunk.dictPageOffset
        .filter(_ >= 0).map(_ min chunk.dataPageOffset)
        .getOrElse(chunk.dataPageOffset)
      if (start < 0 || start > file.length) return None
      var p = start.toInt
      var dict: Vector[PValue] = null
      val out = Vector.newBuilder[Option[PValue]]
      var produced = 0L
      while (produced < chunk.numValues) {
        val r = new ParquetFooter.Reader(file, p, file.length)
        val hdr = r.readStruct(0)
        val pageType = hdr.i(1).getOrElse(return None)
        val uncompressed = hdr.i(2).getOrElse(return None).toInt
        val compressed = hdr.i(3).getOrElse(return None).toInt
        val dataStart = r.p
        if (compressed < 0 || dataStart + compressed > file.length) return None
        val raw = java.util.Arrays.copyOfRange(file, dataStart,
          dataStart + compressed)
        p = dataStart + compressed
        pageType match {
          case 2 => // DICTIONARY_PAGE: PLAIN values
            val dph = hdr.struct(7).getOrElse(return None)
            val n = dph.i(1).getOrElse(return None).toInt
            if (n < 0 || dict != null) return None
            val data = decompress(chunk.codec, raw, uncompressed)
            dict = plainValues(chunk.ptype, data, 0, data.length, n)
          case 0 => // DATA_PAGE v1
            val dph = hdr.struct(5).getOrElse(return None)
            val n = dph.i(1).getOrElse(return None).toInt
            if (n < 0) return None
            val enc = dph.i(2).getOrElse(return None).toInt
            val data = decompress(chunk.codec, raw, uncompressed)
            // definition levels: for an OPTIONAL flat column a 4-byte
            // LE length prefix + RLE at bit width 1; for a REQUIRED
            // column the section is ABSENT (max def level 0, all
            // present). No repetition levels either way (max rep 0).
            val (defs, vFrom) =
              if (chunk.required) (Array.fill(n)(1), 0)
              else {
                if (data.length < 4) return None
                var dlLen = 0
                (0 until 4).foreach(i => dlLen |= (data(i) & 0xff) << (8 * i))
                if (dlLen < 0 || 4 + dlLen > data.length) return None
                (rleHybrid(data, 4, 4 + dlLen, 1, n), 4 + dlLen)
              }
            val nPresent = defs.count(_ == 1)
            val values: Vector[PValue] = enc match {
              case 0 => // PLAIN
                plainValues(chunk.ptype, data, vFrom, data.length, nPresent)
              case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
                if (dict == null) return None
                if (vFrom >= data.length) {
                  if (nPresent > 0) return None
                  Vector.empty
                } else {
                  val bw = data(vFrom) & 0xff
                  if (bw > 32) return None
                  val idx = rleHybrid(data, vFrom + 1, data.length, bw,
                    nPresent)
                  idx.toVector.map { i =>
                    if (i < 0 || i >= dict.length) return None
                    dict(i)
                  }
                }
              case _ => return None // DELTA_* etc: out of scope
            }
            var vi = 0
            defs.foreach { d =>
              if (d == 1) { out += Some(values(vi)); vi += 1 }
              else out += None
            }
            produced += n
          case _ => return None // v2 data pages / index pages: declines
        }
      }
      if (produced != chunk.numValues) return None
      Some(out.result())
    } catch { case NonFatal(_) => None }
}
