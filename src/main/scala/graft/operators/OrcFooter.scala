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

  /** Parse the tail shared by [[probe]] and [[probeStripes]]:
    * (compression kind, Footer message).
    */
  private def tail(b: Array[Byte]): Option[(Long, ProtoLite.PMsg)] = {
    if (b.length < 4) return None
    if (b(0) != 'O' || b(1) != 'R' || b(2) != 'C') return None
    val psLen = b(b.length - 1) & 0xff
    if (psLen <= 0 || psLen + 1 > b.length - 3) return None
    val psStart = b.length - 1 - psLen
    val ps = parse(b, psStart, b.length - 1).getOrElse(return None)
    if (!ps.str(8000).contains("ORC")) return None
    val footerLen = ps.varint(1).getOrElse(return None)
    val kind = ps.varint(2).getOrElse(0L)
    if (compressionName(kind).isEmpty) return None
    if (footerLen <= 0 || footerLen > psStart - 3) return None
    val fStart = psStart - footerLen.toInt
    val raw = deframe(b, fStart, footerLen.toInt, kind).getOrElse(return None)
    parse(raw).map((kind, _))
  }

  /** Probe a whole ORC file image per the scaladoc rules. */
  def probe(b: Array[Byte]): Option[OrcInfo] =
    try {
      val (kind, footer) = tail(b).getOrElse(return None)
      val comp = compressionName(kind).getOrElse(return None)
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

  // ---------------- stripe-footer stream walk (round 11) ----------------

  /** One stream of a stripe footer: kind (orc_proto Stream.Kind —
    * PRESENT=0, DATA=1, LENGTH=2, DICTIONARY_DATA=3, SECONDARY=5,
    * ROW_INDEX=6, BLOOM_FILTER=7/8), owning column, byte length.
    */
  final case class OrcStream(kind: Int, column: Int, length: Long) {
    /** Index-region stream? (row indexes + bloom filters live in the
      * stripe's index section; everything else is data.)
      */
    def isIndex: Boolean = kind >= 6 && kind <= 8
  }

  /** Per-column encoding of one stripe (ColumnEncoding.Kind —
    * DIRECT=0, DICTIONARY=1, DIRECT_V2=2, DICTIONARY_V2=3).
    */
  final case class OrcEncoding(kind: Int, dictionarySize: Long)

  final case class OrcStripe(rows: Long, indexLength: Long,
      dataLength: Long, streams: Vector[OrcStream],
      encodings: Vector[OrcEncoding])

  /** Walk every stripe's FOOTER — the per-stripe message naming the
    * physical streams (what a column reader actually seeks to) and the
    * per-column encodings incl. dictionary sizes. Spec cross-checks
    * enforced, not assumed: the encodings list must match the type
    * tree's length, and the streams must TILE the stripe exactly —
    * index-kind stream lengths summing to `indexLength` and the rest
    * to `dataLength` (the redundancy orc_proto carries so a reader can
    * catch a corrupted stripe directory). Same hostile-byte posture as
    * [[probe]].
    */
  def probeStripes(b: Array[Byte]): Option[Vector[OrcStripe]] =
    try {
      val (kind, footer) = tail(b).getOrElse(return None)
      val nTypes = footer.msgs(4).length
      if (nTypes == 0) return None
      val numRows = footer.varint(6).getOrElse(return None)
      val stripes = footer.msgs(3).map { st =>
        // StripeInformation: offset=1, indexLength=2, dataLength=3,
        // footerLength=4, numberOfRows=5
        val off = st.varint(1).getOrElse(return None)
        val idxLen = st.varint(2).getOrElse(0L)
        val dataLen = st.varint(3).getOrElse(return None)
        val ftrLen = st.varint(4).getOrElse(return None)
        val rows = st.varint(5).getOrElse(return None)
        val sfStart = off + idxLen + dataLen
        if (off < 3 || ftrLen <= 0 || sfStart < 0 ||
          sfStart + ftrLen > b.length) return None
        val raw = deframe(b, sfStart.toInt, ftrLen.toInt, kind)
          .getOrElse(return None)
        val sf = parse(raw).getOrElse(return None)
        // StripeFooter: streams=1{kind=1, column=2, length=3},
        // columns=2{kind=1, dictionarySize=2}
        val streams = sf.msgs(1).map { s =>
          OrcStream(s.varint(1).getOrElse(0L).toInt,
            s.varint(2).getOrElse(0L).toInt,
            s.varint(3).getOrElse(return None))
        }
        val encs = sf.msgs(2).map { e =>
          OrcEncoding(e.varint(1).getOrElse(0L).toInt,
            e.varint(2).getOrElse(0L))
        }
        if (encs.length != nTypes) return None
        if (streams.exists(s => s.length < 0 || s.column < 0 ||
          s.column >= nTypes)) return None
        val (idx, data) = streams.partition(_.isIndex)
        if (idx.map(_.length).sum != idxLen) return None
        if (data.map(_.length).sum != dataLen) return None
        OrcStripe(rows, idxLen, dataLen, streams, encs)
      }
      if (stripes.isEmpty || stripes.map(_.rows).sum != numRows) return None
      Some(stripes)
    } catch { case NonFatal(_) => None }
}
