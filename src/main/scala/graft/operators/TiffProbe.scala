package graft.operators

/** TIFF (6.0) CONTAINER probe: byte-order header, the IFD (image file
  * directory) walk — entry count, 12-byte tagged entries, next-IFD chain
  * for multi-page files — and the baseline geometry tags (ImageWidth,
  * ImageLength, BitsPerSample, Compression, Orientation). The remaining
  * major image container after BMP/Netpbm/PNG/JPEG, and the shape
  * DNG/GeoTIFF lakes carry.
  *
  * Scope mirrors [[Mp4Boxes]]/[[MpegFrames]]: CONTAINER truth only —
  * raster strips/tiles (whose decode depends on per-file compression
  * codecs) are deliberately untouched, never fabricated.
  *
  * Strictness (never throws; None on violation): unknown byte order or
  * magic, an IFD offset outside the file, entries NOT sorted strictly
  * ascending by tag (a spec requirement real writers honor), truncated
  * entry tables, an unterminated IFD chain (cycle), or a page missing
  * width/height.
  */
object TiffProbe {

  /** One page's (IFD's) probed tags. `bits` is BitsPerSample's FIRST value
    * (8 for common RGB), `samplesPerPixel` defaults to 1 when absent per
    * the spec.
    */
  final case class TiffPage(width: Long, height: Long, bits: Long,
      compression: Long, orientation: Long, samplesPerPixel: Long,
      nEntries: Int)

  final case class TiffInfo(littleEndian: Boolean, pages: Vector[TiffPage]) {
    def nPages: Int = pages.length
  }

  private def u16(b: Array[Byte], o: Int, le: Boolean): Int =
    if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int, le: Boolean): Long =
    if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  def probe(b: Array[Byte]): Option[TiffInfo] = {
    if (b.length < 8) return None
    val le = (b(0), b(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => return None
    }
    if (u16(b, 2, le) != 42) return None
    var off = u32(b, 4, le)
    val pages = Vector.newBuilder[TiffPage]
    var n = 0
    while (off != 0) {
      if (n >= 64) return None // unterminated / cyclic IFD chain
      if (off < 8 || off % 2 != 0 || off + 2 > b.length) return None
      val cnt = u16(b, off.toInt, le)
      val base = off.toInt + 2
      if (base + 12 * cnt + 4 > b.length) return None
      var width = -1L; var height = -1L; var bits = -1L
      var comp = 1L; var orient = 1L; var spp = 1L
      var prevTag = -1
      var i = 0
      while (i < cnt) {
        val e = base + 12 * i
        val tag = u16(b, e, le)
        if (tag <= prevTag) return None // tags must sort strictly ascending
        prevTag = tag
        val typ = u16(b, e + 2, le)
        val count = u32(b, e + 4, le)
        // inline SHORT/LONG single values — the forms the geometry tags use
        def value: Option[Long] = (typ, count) match {
          case (3, 1L) => Some(u16(b, e + 8, le).toLong) // SHORT
          case (4, 1L) => Some(u32(b, e + 8, le)) // LONG
          case _ => None
        }
        // BitsPerSample with count k > 2 stores an OFFSET to k SHORTs
        def bitsValue: Option[Long] = (typ, count) match {
          case (3, 1L) => Some(u16(b, e + 8, le).toLong)
          case (3, 2L) => Some(u16(b, e + 8, le).toLong) // first of two inline
          case (3, k) if k >= 3 =>
            val vo = u32(b, e + 8, le)
            if (vo + 2 * k > b.length) None else Some(u16(b, vo.toInt, le).toLong)
          case _ => None
        }
        tag match {
          case 256 => width = value.getOrElse(return None)
          case 257 => height = value.getOrElse(return None)
          case 258 => bits = bitsValue.getOrElse(return None)
          case 259 => comp = value.getOrElse(return None)
          case 274 => orient = value.getOrElse(return None)
          case 277 => spp = value.getOrElse(return None)
          case _ => () // unknown tags are skipped, structure already checked
        }
        i += 1
      }
      if (width < 0 || height < 0) return None // a page needs its geometry
      if (bits < 0) bits = 1 // spec default (bilevel)
      pages += TiffPage(width, height, bits, comp, orient, spp, cnt)
      off = u32(b, base + 12 * cnt, le)
      n += 1
    }
    if (n == 0) return None
    Some(TiffInfo(le, pages.result()))
  }

  /** Page parameters for [[synthTiff]]. */
  final case class SynthPage(width: Long, height: Long, bits: Long,
      compression: Long, orientation: Long, samplesPerPixel: Long)

  /** Synthesize a VALID minimal TIFF: header in either byte order, one
    * IFD per page chained in order, every tag an inline SHORT/LONG, tags
    * sorted ascending per the spec. Real wire format — [[probe]] is not
    * told anything the bytes don't say.
    */
  def synthTiff(littleEndian: Boolean, pages: Seq[SynthPage]): Array[Byte] = {
    require(pages.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      } else {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    w16(42)
    val nTags = 6
    def ifdSize: Int = 2 + 12 * nTags + 4
    w32(8L) // first IFD right after the header
    pages.zipWithIndex.foreach { case (p, pi) =>
      w16(nTags)
      // entries sorted ascending: 256, 257, 258, 259, 274, 277
      def entry(tag: Int, typ: Int, v: Long): Unit = {
        w16(tag); w16(typ); w32(1L)
        // inline value occupies the 4-byte field's LEADING bytes
        if (typ == 3) { w16(v.toInt); w16(0) } else w32(v)
      }
      entry(256, 4, p.width)
      entry(257, 4, p.height)
      entry(258, 3, p.bits)
      entry(259, 3, p.compression)
      entry(274, 3, p.orientation)
      entry(277, 3, p.samplesPerPixel)
      val next = if (pi == pages.size - 1) 0L else 8L + (pi + 1).toLong * ifdSize
      w32(next)
    }
    out.toByteArray
  }
}
