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
  * Both data-page generations decode: v1 (length-prefixed RLE
  * definition levels inside the compressed span) and V2 (levels
  * OUTSIDE the compressed span, no length prefix) including the v2
  * writers' DELTA encodings — DELTA_BINARY_PACKED ints (block/
  * miniblock bit-packed deltas), DELTA_LENGTH_BYTE_ARRAY, and
  * DELTA_BYTE_ARRAY front coding.
  *
  * Scope: flat optional columns (max definition level 1, no
  * repetition levels) of physical types INT32, INT64, BYTE_ARRAY,
  * FLOAT, and DOUBLE — the shape every column of a flat table has;
  * floating-point columns also decode BYTE_STREAM_SPLIT (round 11:
  * the byte-transpose encoding parquet-format 2.8 added for float
  * compressibility — stream j holds every value's j-th byte). Nested
  * columns, the 2.11 int/FLBA BYTE_STREAM_SPLIT extension, and other
  * codecs (GZIP/ZSTD/LZ4) reject rather than mis-decode.
  *
  * Hostile-byte posture: [[readColumn]] never throws — a malformed
  * page header, an unknown codec/encoding, a dictionary index out of
  * range, an RLE run overrunning its section, or a page not yielding
  * its declared value count all yield None.
  */
object ParquetPages {

  sealed trait PValue
  final case class PLong(v: Long) extends PValue
  final case class PDouble(v: Double) extends PValue
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
        case 4 => // FLOAT little-endian (widened to double)
          need(4)
          var bits = 0
          (0 until 4).foreach(i => bits |= (b(p + i) & 0xff) << (8 * i))
          out += PDouble(java.lang.Float.intBitsToFloat(bits).toDouble)
          p += 4
        case 5 => // DOUBLE little-endian
          need(8)
          var bits = 0L
          (0 until 8).foreach(i => bits |= (b(p + i) & 0xffL) << (8 * i))
          out += PDouble(java.lang.Double.longBitsToDouble(bits))
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
        case _ => fail() // BOOLEAN/INT96/FLBA: out of scope here
      }
    }
    if (p > to) fail()
    out.result()
  }

  /** DELTA_BINARY_PACKED decode (the parquet-format encodings spec):
    * header = block size, miniblocks per block, total count, zigzag
    * first value; then per block a zigzag min-delta, one bit width
    * per miniblock, and LSB-first bit-packed deltas — a miniblock's
    * data is full-size when it holds ANY needed value and absent when
    * it holds none. Returns (values, end position).
    */
  private def deltaBinaryPacked(b: Array[Byte], from: Int, to: Int,
      want: Int): (Array[Long], Int) = {
    var p = from
    def u8(): Int = { if (p >= to) fail(); val v = b(p) & 0xff; p += 1; v }
    def varint(): Long = {
      var v = 0L; var sh = 0
      while (true) {
        val c = u8()
        v |= (c & 0x7fL) << sh
        if ((c & 0x80) == 0) return v
        sh += 7
        if (sh > 63) fail()
      }
      0L
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    val blockSize = varint().toInt
    val minis = varint().toInt
    if (blockSize <= 0 || minis <= 0 || blockSize % minis != 0) fail()
    val perMini = blockSize / minis
    if (perMini % 8 != 0) fail()
    val total = varint().toInt
    if (total < want) fail()
    val out = new Array[Long](want)
    var n = 0
    var cur = zigzag()
    if (want > 0) { out(0) = cur; n = 1 }
    var remaining = total - 1 // values still encoded after the first
    while (remaining > 0) {
      val minDelta = zigzag()
      val widths = Array.fill(minis)(u8())
      var mi = 0
      while (mi < minis) {
        val inThis = math.min(perMini, remaining)
        if (inThis > 0) {
          val bw = widths(mi)
          if (bw > 64) fail()
          val bytes = perMini * bw / 8
          if (p + bytes > to) fail()
          var acc = 0L
          var accBits = 0
          var bp = p
          var i = 0
          while (i < perMini) {
            var delta = 0L
            if (bw > 0) {
              var got = 0
              while (got < bw) {
                if (accBits == 0) { acc = b(bp) & 0xffL; accBits = 8; bp += 1 }
                val take = math.min(bw - got, accBits)
                delta |= ((acc & ((1L << take) - 1)) << got)
                acc >>>= take
                accBits -= take
                got += take
              }
            }
            if (i < inThis) {
              cur += minDelta + delta
              if (n < want) { out(n) = cur; n += 1 }
            }
            i += 1
          }
          p += bytes
          remaining -= inThis
        }
        mi += 1
      }
    }
    if (n != want) fail()
    (out, p)
  }

  /** DELTA_LENGTH_BYTE_ARRAY: a DELTA_BINARY_PACKED length sequence
    * followed by the concatenated bytes.
    */
  private def deltaLengthByteArray(b: Array[Byte], from: Int, to: Int,
      want: Int): Vector[PValue] = {
    val (lens, dp) = deltaBinaryPacked(b, from, to, want)
    var p = dp
    lens.toVector.map { len =>
      if (len < 0 || p + len > to) fail()
      val v = PBin(java.util.Arrays.copyOfRange(b, p, p + len.toInt))
      p += len.toInt
      v
    }
  }

  /** DELTA_BYTE_ARRAY (incremental/front coding): prefix lengths and
    * suffix lengths as two DELTA_BINARY_PACKED runs, then suffix data;
    * value i = value[i-1].take(prefix(i)) ++ suffix(i).
    */
  private def deltaByteArray(b: Array[Byte], from: Int, to: Int,
      want: Int): Vector[PValue] = {
    val (prefixes, p1) = deltaBinaryPacked(b, from, to, want)
    val (suffixes, p2) = deltaBinaryPacked(b, p1, to, want)
    var p = p2
    var prev = Array.emptyByteArray
    (0 until want).toVector.map { i =>
      val pl = prefixes(i).toInt
      val sl = suffixes(i).toInt
      if (pl < 0 || sl < 0 || pl > prev.length || p + sl > to) fail()
      val v = new Array[Byte](pl + sl)
      System.arraycopy(prev, 0, v, 0, pl)
      System.arraycopy(b, p, v, pl, sl)
      p += sl
      prev = v
      PBin(v)
    }
  }

  /** Value-section decode shared by v1 and v2 data pages. */
  private def decodeValues(chunk: ParquetFooter.ChunkInfo,
      dict: Vector[PValue], data: Array[Byte], vFrom: Int,
      nPresent: Int, enc: Int): Option[Vector[PValue]] =
    try {
      enc match {
        case 0 => // PLAIN
          Some(plainValues(chunk.ptype, data, vFrom, data.length, nPresent))
        case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
          if (dict == null) return None
          if (vFrom >= data.length) {
            if (nPresent > 0) None else Some(Vector.empty)
          } else {
            val bw = data(vFrom) & 0xff
            if (bw > 32) return None
            val idx = rleHybrid(data, vFrom + 1, data.length, bw, nPresent)
            Some(idx.toVector.map { i =>
              if (i < 0 || i >= dict.length) return None
              dict(i)
            })
          }
        case 5 => // DELTA_BINARY_PACKED (INT32/INT64)
          if (chunk.ptype != 1 && chunk.ptype != 2) return None
          Some(deltaBinaryPacked(data, vFrom, data.length, nPresent)
            ._1.toVector.map(PLong(_)))
        case 6 => // DELTA_LENGTH_BYTE_ARRAY
          if (chunk.ptype != 6) return None
          Some(deltaLengthByteArray(data, vFrom, data.length, nPresent))
        case 7 => // DELTA_BYTE_ARRAY
          if (chunk.ptype != 6) return None
          Some(deltaByteArray(data, vFrom, data.length, nPresent))
        case 9 => // BYTE_STREAM_SPLIT (FLOAT/DOUBLE; format 2.8+)
          val w = chunk.ptype match {
            case 4 => 4
            case 5 => 8
            case _ => return None // the 2.11 int/FLBA extension: decline
          }
          // value i's byte j lives in stream j: data[vFrom + j*n + i] —
          // the transpose that makes float columns compress
          if (data.length - vFrom != w * nPresent) return None
          Some((0 until nPresent).toVector.map { i =>
            var bits = 0L
            (0 until w).foreach(j =>
              bits |= (data(vFrom + j * nPresent + i) & 0xffL) << (8 * j))
            if (w == 4) PDouble(java.lang.Float.intBitsToFloat(bits.toInt).toDouble)
            else PDouble(java.lang.Double.longBitsToDouble(bits))
          })
        case _ => None // unknown encodings: out of scope
      }
    } catch { case NonFatal(_) => None }

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
            val values = decodeValues(chunk, dict, data, vFrom, nPresent, enc)
              .getOrElse(return None)
            var vi = 0
            defs.foreach { d =>
              if (d == 1) { out += Some(values(vi)); vi += 1 }
              else out += None
            }
            produced += n
          case 3 => // DATA_PAGE_V2: levels live OUTSIDE the compressed span
            val dph = hdr.struct(8).getOrElse(return None)
            val n = dph.i(1).getOrElse(return None).toInt
            if (n < 0) return None
            val enc = dph.i(4).getOrElse(return None).toInt
            val dlLen = dph.i(5).getOrElse(return None).toInt
            val rlLen = dph.i(6).getOrElse(return None).toInt
            val isCompressed = dph.fields.get(7)
              .collect { case ParquetFooter.TBool(v) => v }.getOrElse(true)
            if (rlLen != 0) return None // flat columns carry no rep levels
            if (dlLen < 0 || dlLen > raw.length) return None
            // def levels: plain RLE (no 4-byte prefix), never compressed
            val defs =
              if (chunk.required) {
                if (dlLen != 0) return None
                Array.fill(n)(1)
              } else rleHybrid(raw, 0, dlLen, 1, n)
            val nPresent = defs.count(_ == 1)
            val valuesRaw = java.util.Arrays.copyOfRange(raw, dlLen, raw.length)
            val data =
              if (isCompressed)
                decompress(chunk.codec, valuesRaw, uncompressed - dlLen)
              else valuesRaw
            val values = decodeValues(chunk, dict, data, 0, nPresent, enc)
              .getOrElse(return None)
            var vi = 0
            defs.foreach { d =>
              if (d == 1) { out += Some(values(vi)); vi += 1 }
              else out += None
            }
            produced += n
          case _ => return None // index pages etc: declines
        }
      }
      if (produced != chunk.numValues) return None
      Some(out.result())
    } catch { case NonFatal(_) => None }
}
