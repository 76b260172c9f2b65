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

  // ---------------- generic protobuf-lite value model ----------------

  sealed trait PVal
  final case class PVarint(v: Long) extends PVal
  final case class PFixed64(v: Long) extends PVal
  final case class PFixed32(v: Int) extends PVal
  final case class PBytes(b: Array[Byte]) extends PVal

  final case class PMsg(fields: Map[Int, Vector[PVal]]) {
    def varint(id: Int): Option[Long] =
      fields.get(id).flatMap(_.headOption).collect { case PVarint(v) => v }
    def varints(id: Int): Vector[Long] =
      fields.getOrElse(id, Vector.empty).collect { case PVarint(v) => v }
    def bytes(id: Int): Option[Array[Byte]] =
      fields.get(id).flatMap(_.headOption).collect { case PBytes(b) => b }
    def str(id: Int): Option[String] = bytes(id).map(new String(_, "UTF-8"))
    def msg(id: Int): Option[PMsg] = bytes(id).flatMap(b => parse(b))
    def msgs(id: Int): Vector[PMsg] =
      fields.getOrElse(id, Vector.empty).collect { case PBytes(b) => b }
        .map(b => parse(b).getOrElse(return Vector.empty))
  }

  /** sint64 decode: protobuf zigzag over a raw varint. */
  def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Parse one protobuf message from a byte slice. None on any
    * malformation; repeated fields keep arrival order.
    */
  def parse(b: Array[Byte], from: Int = 0, to: Int = -1): Option[PMsg] =
    try {
      val end = if (to < 0) b.length else to
      var p = from
      def u8(): Int = {
        if (p >= end) throw new RuntimeException("eof")
        val v = b(p) & 0xff; p += 1; v
      }
      def varint(): Long = {
        var v = 0L; var sh = 0
        while (true) {
          val c = u8()
          v |= (c & 0x7fL) << sh
          if ((c & 0x80) == 0) return v
          sh += 7
          if (sh > 63) throw new RuntimeException("varint")
        }
        0L
      }
      val fields = scala.collection.mutable.LinkedHashMap.empty[Int, Vector[PVal]]
      while (p < end) {
        val tag = varint()
        val id = (tag >>> 3).toInt
        if (id <= 0) return None
        val v: PVal = (tag & 7) match {
          case 0 => PVarint(varint())
          case 1 =>
            var x = 0L
            (0 until 8).foreach(i => x |= u8().toLong << (8 * i))
            PFixed64(x)
          case 2 =>
            val n = varint()
            if (n < 0 || n > end - p) return None
            val out = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
            p += n.toInt
            PBytes(out)
          case 5 =>
            var x = 0
            (0 until 4).foreach(i => x |= u8() << (8 * i))
            PFixed32(x)
          case _ => return None // groups / reserved wire types
        }
        fields(id) = fields.getOrElse(id, Vector.empty) :+ v
      }
      Some(PMsg(fields.toMap))
    } catch { case NonFatal(_) => None }

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
