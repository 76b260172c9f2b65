package graft.operators

import scala.util.control.NonFatal

/** ORC FILE TAIL probe — the third lake format's metadata reader
  * beside [[ParquetFooter]] (Thrift) and [[AvroOcf]] (avro binary):
  * ORC's tail is PROTOBUF (the public orc_proto.proto in the Apache
  * ORC spec) — a one-byte postscript length at the very end, the
  * uncompressed PostScript message (footer length, compression kind,
  * version, the "ORC" magic in field 8000), then the Footer message
  * holding stripes, the type tree, row counts, and per-column
  * statistics, compressed under the file's own codec.
  *
  * The protobuf decoder is generic (varint / 64-bit / length-delimited
  * / 32-bit wire types, REPEATED fields kept in order, nested messages
  * parsed on demand) and the ORC mapping picks the spec-numbered
  * fields — PostScript{footerLength=1, compression=2, magic=8000},
  * Footer{stripes=3{numberOfRows=5}, types=4{kind=1}, numberOfRows=6,
  * statistics=7{numberOfValues=1, intStatistics=2{min/max/sum sint64
  * ZIGZAG — the signed-varint trap}, stringStatistics=4}}.
  *
  * Compressed tails are decoded for real: ORC frames compressed
  * streams as 3-byte little-endian block headers `(len << 1) |
  * isOriginal` followed by SNAPPY (snappy-java, shipped with Spark)
  * or ZLIB (raw RFC 1951, JDK Inflater) blocks. NONE passes through;
  * ZSTD/LZO/LZ4 are explicit declines.
  *
  * Hostile-byte posture: [[probe]] never throws — a missing magic, a
  * postscript overrunning the file, an unknown compression kind, a
  * malformed protobuf stream, a block header overrunning its stream,
  * or a stripe row-count sum disagreeing with the footer's total all
  * yield None.
  */
object OrcFooter {

  import ProtoLite.{parse, zigzag, PBytes, PMsg, PVarint}

  // ---------------- ORC tail mapping ----------------

  final case class OrcColumnStats(numValues: Long, intMin: Option[Long],
      intMax: Option[Long], intSum: Option[Long], strMin: Option[String],
      strMax: Option[String])

  /** Parsed tail: compression name, footer row count, stripe count
    * (their row sums are verified against the footer total), the type
    * tree's kind codes in preorder, and per-column statistics aligned
    * with the types.
    */
  final case class OrcInfo(compression: String, numRows: Long,
      nStripes: Int, typeKinds: Vector[Int], stats: Vector[OrcColumnStats])

  private def compressionName(kind: Long): Option[String] = kind match {
    case 0 => Some("NONE")
    case 1 => Some("ZLIB")
    case 2 => Some("SNAPPY")
    case _ => None // LZO/LZ4/ZSTD: explicit declines
  }

  /** Undo ORC's compressed-stream block framing: 3-byte LE headers
    * `(len << 1) | isOriginal`, SNAPPY or raw-DEFLATE block payloads.
    */
  private def deframe(b: Array[Byte], from: Int, len: Int,
      kind: Long): Option[Array[Byte]] =
    try {
      if (kind == 0) return Some(java.util.Arrays.copyOfRange(b, from, from + len))
      val out = new java.io.ByteArrayOutputStream()
      var p = from
      val end = from + len
      while (p < end) {
        if (p + 3 > end) return None
        val h = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
        val original = (h & 1) == 1
        val blockLen = h >>> 1
        p += 3
        if (blockLen <= 0 || p + blockLen > end) return None
        if (original) out.write(b, p, blockLen)
        else if (kind == 2) {
          val block = java.util.Arrays.copyOfRange(b, p, p + blockLen)
          val u = org.xerial.snappy.Snappy.uncompress(block)
          out.write(u, 0, u.length)
        } else {
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(b, p, blockLen)
            val buf = new Array[Byte](8192)
            while (!inf.finished()) {
              val n = inf.inflate(buf)
              if (n == 0 && !inf.finished()) return None
              out.write(buf, 0, n)
              if (out.size() > (64 << 20)) return None // bomb guard
            }
          } finally inf.end()
        }
        p += blockLen
      }
      Some(out.toByteArray)
    } catch { case NonFatal(_) => None }

  /** Probe a whole ORC file image per the scaladoc rules. */
  def probe(b: Array[Byte]): Option[OrcInfo] =
    try {
      if (b.length < 4) return None
      if (b(0) != 'O' || b(1) != 'R' || b(2) != 'C') return None
      val psLen = b(b.length - 1) & 0xff
      if (psLen <= 0 || psLen + 1 > b.length - 3) return None
      val psStart = b.length - 1 - psLen
      val ps = parse(b, psStart, b.length - 1).getOrElse(return None)
      if (!ps.str(8000).contains("ORC")) return None
      val footerLen = ps.varint(1).getOrElse(return None)
      val kind = ps.varint(2).getOrElse(0L)
      val comp = compressionName(kind).getOrElse(return None)
      if (footerLen <= 0 || footerLen > psStart - 3) return None
      val fStart = psStart - footerLen.toInt
      val raw = deframe(b, fStart, footerLen.toInt, kind).getOrElse(return None)
      val footer = parse(raw).getOrElse(return None)
      val numRows = footer.varint(6).getOrElse(return None)
      val stripes = footer.msgs(3)
      val stripeRows = stripes.map(_.varint(5).getOrElse(return None))
      if (stripeRows.sum != numRows) return None // internal consistency
      val kinds = footer.msgs(4).map(_.varint(1).getOrElse(return None).toInt)
      if (kinds.isEmpty) return None
      val stats = footer.msgs(7).map { cs =>
        val nv = cs.varint(1).getOrElse(-1L)
        val is = cs.msg(2)
        val ss = cs.msg(4)
        OrcColumnStats(nv,
          is.flatMap(_.varint(1)).map(zigzag),
          is.flatMap(_.varint(2)).map(zigzag),
          is.flatMap(_.varint(3)).map(zigzag),
          ss.flatMap(_.str(1)), ss.flatMap(_.str(2)))
      }
      Some(OrcInfo(comp, numRows, stripes.length, kinds, stats))
    } catch { case NonFatal(_) => None }
}
