package graft.operators

import scala.util.control.NonFatal

/** PARQUET FOOTER probe — a pure-JVM decode of the format the lake
  * itself is stored in: the `PAR1`-framed footer holding a Thrift
  * COMPACT-protocol `FileMetaData` struct (both layouts are public —
  * the parquet-format spec and the Thrift compact-protocol spec).
  * This is the file-level introspection a 100 TB lake's planner and
  * auditors run constantly — row counts, row-group geometry, column
  * schema, codecs, and min/max statistics — WITHOUT reading one data
  * page and without an engine session, the way `parquet-tools meta`
  * or DuckDB's `parquet_metadata()` do.
  *
  * The Thrift compact decoder is generic (varint/zigzag ints,
  * delta-encoded field ids, size-prefixed binaries, nested
  * lists/structs, bounded depth) and the FileMetaData mapping picks
  * the spec-numbered fields: num_rows(3), schema(2) SchemaElement
  * names(4), row_groups(4) -> ColumnChunk.meta_data(3) ->
  * codec(4)/num_values(5)/statistics(12) with both the modern
  * min_value/max_value(6/5) and the legacy min/max(2/1) stat fields.
  *
  * Scope: footer metadata only; page data is deliberately never
  * touched (decode lives in the engine's scan path). Hostile-byte
  * posture: [[probe]] never throws — a missing magic, a footer length
  * overrunning the file, a truncated varint, an unknown compact type,
  * out-of-spec nesting depth, or a malformed struct all yield None.
  */
object ParquetFooter {

  // ---------------- generic Thrift compact value model ----------------

  sealed trait TVal
  final case class TBool(v: Boolean) extends TVal
  final case class TI(v: Long) extends TVal
  final case class TD(v: Double) extends TVal
  final case class TBin(v: Array[Byte]) extends TVal
  final case class TList(vs: Vector[TVal]) extends TVal
  final case class TStruct(fields: Map[Int, TVal]) extends TVal {
    def i(id: Int): Option[Long] = fields.get(id).collect { case TI(v) => v }
    def bin(id: Int): Option[Array[Byte]] =
      fields.get(id).collect { case TBin(v) => v }
    def str(id: Int): Option[String] =
      bin(id).map(new String(_, "UTF-8"))
    def list(id: Int): Option[Vector[TVal]] =
      fields.get(id).collect { case TList(v) => v }
    def struct(id: Int): Option[TStruct] =
      fields.get(id).collect { case s: TStruct => s }
  }

  private[operators] final class Malformed extends RuntimeException

  private[operators] final class Reader(b: Array[Byte], var p: Int, end: Int) {
    private def fail(): Nothing = throw new Malformed
    def u8(): Int = {
      if (p >= end) fail()
      val v = b(p) & 0xff; p += 1; v
    }
    def varint(): Long = {
      var v = 0L; var sh = 0
      while (true) {
        val c = u8()
        v |= (c & 0x7fL) << sh
        if ((c & 0x80) == 0) return v
        sh += 7
        if (sh > 63) fail()
      }
      v // unreachable
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def bytes(n: Long): Array[Byte] = {
      if (n < 0 || n > end - p) fail()
      val out = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
      p += n.toInt; out
    }
    def readValue(tpe: Int, depth: Int): TVal = {
      if (depth > 16) fail()
      tpe match {
        case 1 => TBool(true)
        case 2 => TBool(false)
        case 3 => TI(u8().toByte.toLong) // i8: one raw byte
        case 4 | 5 | 6 => TI(zigzag())
        case 7 => // double: 8 bytes little-endian
          var bits = 0L
          (0 until 8).foreach(i => bits |= (u8().toLong & 0xff) << (8 * i))
          TD(java.lang.Double.longBitsToDouble(bits))
        case 8 => TBin(bytes(varint()))
        case 9 | 10 =>
          val h = u8()
          val et = h & 0xf
          val sz = if (((h >> 4) & 0xf) == 15) varint() else ((h >> 4) & 0xf).toLong
          if (sz < 0 || sz > end - p) fail() // every element is >= 1 byte
          TList((0L until sz).map { _ =>
            if (et == 1 || et == 2) {
              // bool list elements are one byte each (0x01 true)
              TBool(u8() == 1)
            } else readValue(et, depth + 1)
          }.toVector)
        case 12 => readStruct(depth + 1)
        case _ => fail() // maps and reserved types: absent from FileMetaData
      }
    }
    def readStruct(depth: Int): TStruct = {
      if (depth > 16) fail()
      var last = 0
      val fields = Map.newBuilder[Int, TVal]
      var stop = false
      while (!stop) {
        val h = u8()
        if (h == 0) stop = true
        else {
          val delta = (h >> 4) & 0xf
          val tpe = h & 0xf
          val id = if (delta == 0) zigzag().toInt else last + delta
          if (id <= 0 || id > Short.MaxValue) fail()
          fields += ((id, readValue(tpe, depth)))
          last = id
        }
      }
      TStruct(fields.result())
    }
  }

  // ---------------- FileMetaData mapping ----------------

  /** One column chunk of the first row group. `statMin`/`statMax` are
    * the raw plain-encoded stat bytes (modern min_value/max_value
    * fields preferred, legacy min/max as fallback); [[intStat]]
    * decodes the INT32/INT64 forms.
    */
  final case class ChunkInfo(pathInSchema: String, codec: Int,
      numValues: Long, nullCount: Long, statMin: Option[Array[Byte]],
      statMax: Option[Array[Byte]], ptype: Int = -1,
      dataPageOffset: Long = -1L, dictPageOffset: Option[Long] = None,
      compressedBytes: Long = -1L, required: Boolean = false,
      encodings: Vector[Int] = Vector.empty)

  /** Parsed footer: file row count, schema column names (leaf order),
    * row-group count, and the first row group's chunk details.
    */
  final case class FooterInfo(version: Long, numRows: Long,
      createdBy: String, columnNames: Vector[String], nRowGroups: Int,
      firstGroupChunks: Vector[ChunkInfo]) {
    def codecName(codec: Int): String = codec match {
      case 0 => "UNCOMPRESSED"
      case 1 => "SNAPPY"
      case 2 => "GZIP"
      case 3 => "LZO"
      case 4 => "BROTLI"
      case 5 => "LZ4"
      case 6 => "ZSTD"
      case 7 => "LZ4_RAW"
      case c => s"UNKNOWN($c)"
    }
  }

  /** Decode an INT32 (4-byte) or INT64 (8-byte) little-endian
    * plain-encoded statistics value.
    */
  def intStat(raw: Array[Byte]): Option[Long] = raw.length match {
    case 4 =>
      Some(((raw(0) & 0xffL) | ((raw(1) & 0xffL) << 8) |
        ((raw(2) & 0xffL) << 16) | ((raw(3) & 0xffL) << 24)).toInt.toLong)
    case 8 =>
      Some((0 until 8).foldLeft(0L)((a, i) => a | (raw(i) & 0xffL) << (8 * i)))
    case _ => None
  }

  /** Probe a whole parquet file image: leading+trailing `PAR1` magic,
    * 4-byte little-endian footer length, Thrift compact FileMetaData.
    */
  def probe(b: Array[Byte]): Option[FooterInfo] =
    try {
      if (b.length < 12) return None
      if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return None
      val n = b.length
      if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
        b(n - 1) != '1') return None
      val flen = (b(n - 8) & 0xffL) | ((b(n - 7) & 0xffL) << 8) |
        ((b(n - 6) & 0xffL) << 16) | ((b(n - 5) & 0xffL) << 24)
      if (flen <= 0 || flen > n - 12) return None
      val start = n - 8 - flen.toInt
      val md = new Reader(b, start, n - 8).readStruct(0)
      val numRows = md.i(3).getOrElse(return None)
      val schema = md.list(2).getOrElse(return None)
      // leaf columns: every SchemaElement after the root that declares
      // no children (the flat-table case; nested groups keep their
      // leaves, which is still the chunk path grain)
      val leaves = schema.drop(1).collect {
        case s: TStruct if s.i(5).forall(_ == 0) =>
          // (name, repetition_type): 0 = REQUIRED, 1 = OPTIONAL
          (s.str(4).getOrElse(return None), s.i(3).getOrElse(1L))
      }
      val cols = leaves.map(_._1)
      val requiredByName = leaves.map { case (n, rep) => n -> (rep == 0L) }.toMap
      val groups = md.list(4).getOrElse(return None)
      val first = groups.headOption match {
        case Some(g: TStruct) =>
          g.list(1).getOrElse(return None).map {
            case c: TStruct =>
              val meta = c.struct(3).getOrElse(return None)
              val stats = meta.struct(12)
              val path = meta.list(3).getOrElse(return None)
                .collect { case TBin(v) => new String(v, "UTF-8") }
                .mkString(".")
              ChunkInfo(
                path,
                meta.i(4).getOrElse(return None).toInt,
                meta.i(5).getOrElse(return None),
                stats.flatMap(_.i(3)).getOrElse(-1L),
                stats.flatMap(s => s.bin(6).orElse(s.bin(2))),
                stats.flatMap(s => s.bin(5).orElse(s.bin(1))),
                meta.i(1).getOrElse(-1L).toInt,
                meta.i(9).getOrElse(-1L),
                meta.i(11),
                meta.i(7).getOrElse(-1L),
                requiredByName.getOrElse(path, false),
                meta.list(2).getOrElse(Vector.empty)
                  .collect { case TI(v) => v.toInt })
            case _ => return None
          }
        case _ => Vector.empty
      }
      Some(FooterInfo(md.i(1).getOrElse(-1L), numRows,
        md.str(6).getOrElse(""), cols, groups.length, first))
    } catch { case NonFatal(_) => None }

  // ---------------- page index (ColumnIndex + OffsetIndex) ----------------

  /** One data page of a column chunk as described by the PAGE INDEX — the
    * parquet-format structures (`ColumnIndex`: per-page min/max/null-page/
    * null-count; `OffsetIndex`: per-page offset/size/first_row_index)
    * written OUTSIDE the pages themselves so a reader can skip pages
    * without touching one data byte. `min`/`max` decode the INT32/INT64
    * plain stat bytes; `nRows` derives from consecutive first_row_index
    * values (last page: row-group row count minus its first row).
    */
  final case class PageIndexEntry(page: Int, firstRow: Long, nRows: Long,
      min: Option[Long], max: Option[Long], nullPage: Boolean,
      nullCount: Long)

  /** Parse the page index of column `path` in the FIRST row group:
    * ColumnChunk.offset_index_offset(4)/length(5) →
    * OffsetIndex{page_locations(1: list<PageLocation{offset(1),
    * compressed_page_size(2), first_row_index(3)}>)}, and
    * ColumnChunk.column_index_offset(6)/length(7) →
    * ColumnIndex{null_pages(1), min_values(2), max_values(3),
    * boundary_order(4), null_counts(5)}. Same hostile-byte posture as
    * [[probe]]: any absent field, range overrun, or list-length mismatch
    * yields None, never a throw.
    */
  def pageIndex(b: Array[Byte], path: String): Option[Vector[PageIndexEntry]] =
    try {
      if (b.length < 12) return None
      if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return None
      val n = b.length
      if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
        b(n - 1) != '1') return None
      val flen = (b(n - 8) & 0xffL) | ((b(n - 7) & 0xffL) << 8) |
        ((b(n - 6) & 0xffL) << 16) | ((b(n - 5) & 0xffL) << 24)
      if (flen <= 0 || flen > n - 12) return None
      val md = new Reader(b, n - 8 - flen.toInt, n - 8).readStruct(0)
      val g = md.list(4).flatMap(_.headOption) match {
        case Some(s: TStruct) => s
        case _ => return None
      }
      val groupRows = g.i(3).getOrElse(return None)
      val chunk = g.list(1).getOrElse(return None).collectFirst {
        case c: TStruct if c.struct(3).exists(_.list(3).exists(
          _.collect { case TBin(v) => new String(v, "UTF-8") }
            .mkString(".") == path)) => c
      }.getOrElse(return None)
      def range(offId: Int, lenId: Int): Option[(Int, Int)] = for {
        off <- chunk.i(offId)
        len <- chunk.i(lenId)
        if off >= 0 && len > 0 && off + len <= n
      } yield (off.toInt, (off + len).toInt)
      val (oiFrom, oiTo) = range(4, 5).getOrElse(return None)
      val (ciFrom, ciTo) = range(6, 7).getOrElse(return None)
      val oi = new Reader(b, oiFrom, oiTo).readStruct(0)
      val ci = new Reader(b, ciFrom, ciTo).readStruct(0)
      val locs = oi.list(1).getOrElse(return None).map {
        case s: TStruct => s.i(3).getOrElse(return None)
        case _ => return None
      }
      val nullPages = ci.list(1).getOrElse(return None).map {
        case TBool(v) => v
        case _ => return None
      }
      val mins = ci.list(2).getOrElse(return None).map {
        case TBin(v) => v
        case _ => return None
      }
      val maxs = ci.list(3).getOrElse(return None).map {
        case TBin(v) => v
        case _ => return None
      }
      val nullCounts = ci.list(5).map(_.map {
        case TI(v) => v
        case _ => return None
      })
      val np = locs.length
      if (nullPages.length != np || mins.length != np || maxs.length != np)
        return None
      if (np == 0 || locs.head != 0L) return None
      Some((0 until np).map { p =>
        val next = if (p + 1 < np) locs(p + 1) else groupRows
        if (next < locs(p)) return None
        PageIndexEntry(p, locs(p), next - locs(p),
          if (nullPages(p)) None else intStat(mins(p)),
          if (nullPages(p)) None else intStat(maxs(p)),
          nullPages(p),
          nullCounts.map(_(p)).getOrElse(-1L))
      }.toVector)
    } catch { case NonFatal(_) => None }
}
