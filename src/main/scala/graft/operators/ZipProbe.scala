package graft.operators

/** ZIP ARCHIVE probe (the public PKWARE APPNOTE layout): the central-
  * directory walk a document lake's prober runs over its docx/epub/jar
  * payloads — entry names, methods, sizes, offsets — plus REAL member
  * extraction: STORED members are sliced, DEFLATE members are inflated
  * with the JDK's raw-deflate `Inflater`, and every extraction is
  * CRC-32- and size-verified against the directory's declared values.
  * Nothing is fabricated: a member that fails its checksum or declared
  * length yields None, never a guessed payload.
  *
  * Layout notes embodied here (all integers little-endian): the end-of-
  * central-directory record is found by scanning backward over its
  * variable-length comment; the central directory must tile exactly
  * ([cdOffset, cdOffset+cdSize) holds exactly `entries` records); every
  * entry's local file header is cross-checked (signature, name, method,
  * crc, sizes) — a directory/local disagreement rejects the probe.
  *
  * Scope: single-disk archives, methods 0 (stored) and 8 (deflate),
  * no encryption (general-purpose bit 0), no data descriptors (bit 3:
  * the streamed form writes zeros in the local header and patches
  * after the fact; this prober requires the authoritative values
  * up front and rejects the streamed form rather than trusting
  * unvalidated sizes), no ZIP64. All rejections are None, never a
  * throw.
  */
object ZipProbe {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private val LfhSig = 0x04034b50L
  private val CdhSig = 0x02014b50L
  private val EocdSig = 0x06054b50L

  /** One central-directory entry, local header already cross-checked.
    * `dataOffset` points at the member's first payload byte.
    */
  final case class ZipEntry(name: String, method: Int, csize: Long,
      usize: Long, crc32: Long, lfhOffset: Long, dataOffset: Long)

  /** Parsed archive: directory entries (in directory order), the
    * directory's declared span, and the archive comment.
    */
  final case class ZipInfo(entries: Vector[ZipEntry], cdOffset: Long,
      cdSize: Long, comment: String) {
    def nEntries: Int = entries.length
    def totalCompressed: Long = entries.map(_.csize).sum
    def totalUncompressed: Long = entries.map(_.usize).sum
  }

  /** Walk an archive: locate the EOCD (backward scan over the comment),
    * walk the central directory with exact tiling, cross-check every
    * local header. None on any malformation; never throws.
    */
  def probe(b: Array[Byte]): Option[ZipInfo] = {
    // EOCD: 22 fixed bytes + comment; the record whose commentLen walks
    // exactly to end-of-file is the authoritative one
    var e = b.length - 22
    var found = -1
    while (e >= 0 && found < 0) {
      if (le32(b, e) == EocdSig && e + 22 + le16(b, e + 20) == b.length)
        found = e
      else e -= 1
    }
    if (found < 0) return None
    val eocd = found
    // single-disk only
    if (le16(b, eocd + 4) != 0 || le16(b, eocd + 6) != 0) return None
    val nThis = le16(b, eocd + 8)
    val nTotal = le16(b, eocd + 10)
    if (nThis != nTotal) return None
    val cdSize = le32(b, eocd + 12)
    val cdOffset = le32(b, eocd + 16)
    val comment = new String(b, eocd + 22, le16(b, eocd + 20), "UTF-8")
    if (cdOffset + cdSize != eocd.toLong) return None
    val entries = Vector.newBuilder[ZipEntry]
    var p = cdOffset.toInt
    var i = 0
    while (i < nTotal) {
      if (p + 46 > eocd || le32(b, p) != CdhSig) return None
      val flags = le16(b, p + 8)
      if ((flags & 0x0001) != 0) return None // encrypted: out of scope
      if ((flags & 0x0008) != 0) return None // data descriptor: declined
      val method = le16(b, p + 10)
      if (method != 0 && method != 8) return None
      val crc = le32(b, p + 16)
      val csize = le32(b, p + 20)
      val usize = le32(b, p + 24)
      if (method == 0 && csize != usize) return None
      val nameLen = le16(b, p + 28)
      val extraLen = le16(b, p + 30)
      val commentLen = le16(b, p + 32)
      if (le16(b, p + 34) != 0) return None // disk-start of the member
      val lfhOff = le32(b, p + 42)
      if (p + 46 + nameLen + extraLen + commentLen > eocd) return None
      val name = new String(b, p + 46, nameLen, "UTF-8")
      // cross-check the local header: signature, name, and the
      // authoritative fields must agree with the directory
      if (lfhOff + 30 > cdOffset) return None // local headers precede the cd
      val l = lfhOff.toInt
      if (le32(b, l) != LfhSig) return None
      if (le16(b, l + 6) != flags || le16(b, l + 8) != method) return None
      if (le32(b, l + 14) != crc || le32(b, l + 18) != csize ||
        le32(b, l + 22) != usize) return None
      val lNameLen = le16(b, l + 26)
      val lExtraLen = le16(b, l + 28)
      if (l + 30 + lNameLen + lExtraLen > cdOffset) return None
      if (lNameLen != nameLen ||
        new String(b, l + 30, lNameLen, "UTF-8") != name) return None
      val dataOff = l + 30 + lNameLen + lExtraLen
      if (dataOff + csize > cdOffset) return None
      entries += ZipEntry(name, method, csize, usize, crc, lfhOff, dataOff)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    if (p != eocd) return None // directory must tile its declared span
    Some(ZipInfo(entries.result(), cdOffset, cdSize, comment))
  }

  /** Extract one member: slice (stored) or raw-inflate (deflate), then
    * verify the declared uncompressed size AND the CRC-32 — a mismatch
    * yields None, never a corrupt payload.
    */
  def extract(b: Array[Byte], entry: ZipEntry): Option[Array[Byte]] = {
    if (entry.dataOffset + entry.csize > b.length) return None
    if (entry.usize > Int.MaxValue - 16 || entry.usize < 0) return None
    val from = entry.dataOffset.toInt
    val raw = java.util.Arrays.copyOfRange(b, from, from + entry.csize.toInt)
    val out: Array[Byte] = entry.method match {
      case 0 => raw
      case 8 =>
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(raw)
          val buf = new Array[Byte](entry.usize.toInt)
          var got = 0
          while (got < buf.length && !inf.finished()) {
            val k = try inf.inflate(buf, got, buf.length - got)
            catch { case _: java.util.zip.DataFormatException => return None }
            if (k == 0 && (inf.finished() || inf.needsInput())) return None
            got += k
          }
          // the stream must end exactly at the declared size
          if (got != buf.length) return None
          if (!inf.finished()) {
            val probeByte = new Array[Byte](1)
            val k = try inf.inflate(probeByte)
            catch { case _: java.util.zip.DataFormatException => return None }
            if (k != 0 || !inf.finished()) return None
          }
          buf
        } finally inf.end()
      case _ => return None
    }
    if (out.length.toLong != entry.usize) return None
    val crc = new java.util.zip.CRC32()
    crc.update(out)
    if (crc.getValue != entry.crc32) return None
    Some(out)
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format.
  // ------------------------------------------------------------------

  /** One member to synthesize: method 0 stores the content; method 8
    * deflates it. `storedBlockDeflate` selects the closed-form deflate
    * encoding (a single BTYPE=00 stored block: csize = usize + 5,
    * byte-predictable for the oracle); otherwise the JDK Deflater
    * produces a real compressed stream (csize then depends on the
    * compressor and is NOT closed-form).
    */
  final case class SynthMember(name: String, content: Array[Byte],
      method: Int, storedBlockDeflate: Boolean = true)

  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def w32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  /** Raw-deflate a payload as one BTYPE=00 stored block: 1 header byte
    * (BFINAL=1, BTYPE=00), LEN, NLEN (ones-complement), then the bytes.
    * A fully valid deflate stream any inflater accepts — with a
    * closed-form size.
    */
  def storedBlock(content: Array[Byte]): Array[Byte] = {
    require(content.length <= 0xffff, "one stored block holds <= 65535 bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x01) // BFINAL=1, BTYPE=00
    w16(out, content.length)
    w16(out, content.length ^ 0xffff)
    out.write(content, 0, content.length)
    out.toByteArray
  }

  /** Synthesize a VALID single-disk archive: local headers + data in
    * member order, the central directory, the EOCD with `comment`. Real
    * wire format with true CRC-32s — [[probe]]/[[extract]] are not told
    * anything the bytes don't say.
    */
  def synth(members: Seq[SynthMember], comment: String): Array[Byte] = {
    // fixed deterministic DOS timestamp: 2020-01-01 00:00:00
    val dosDate = ((2020 - 1980) << 9) | (1 << 5) | 1
    val dosTime = 0
    val out = new java.io.ByteArrayOutputStream()
    val cds = new java.io.ByteArrayOutputStream()
    var count = 0
    members.foreach { m =>
      require(m.method == 0 || m.method == 8, s"method ${m.method}")
      val crc = new java.util.zip.CRC32()
      crc.update(m.content)
      val data: Array[Byte] = m.method match {
        case 0 => m.content
        case 8 if m.storedBlockDeflate => storedBlock(m.content)
        case _ =>
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(m.content); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          d.end()
          buf.toByteArray
      }
      val nameBytes = m.name.getBytes("UTF-8")
      val lfhOff = out.size()
      w32(out, LfhSig)
      w16(out, 20); w16(out, 0); w16(out, m.method)
      w16(out, dosTime); w16(out, dosDate)
      w32(out, crc.getValue)
      w32(out, data.length.toLong); w32(out, m.content.length.toLong)
      w16(out, nameBytes.length); w16(out, 0)
      out.write(nameBytes, 0, nameBytes.length)
      out.write(data, 0, data.length)
      w32(cds, CdhSig)
      w16(cds, 20); w16(cds, 20); w16(cds, 0); w16(cds, m.method)
      w16(cds, dosTime); w16(cds, dosDate)
      w32(cds, crc.getValue)
      w32(cds, data.length.toLong); w32(cds, m.content.length.toLong)
      w16(cds, nameBytes.length); w16(cds, 0); w16(cds, 0)
      w16(cds, 0); w16(cds, 0); w32(cds, 0)
      w32(cds, lfhOff.toLong)
      cds.write(nameBytes, 0, nameBytes.length)
      count += 1
    }
    val cdOffset = out.size()
    val cd = cds.toByteArray
    out.write(cd, 0, cd.length)
    val commentBytes = comment.getBytes("UTF-8")
    w32(out, EocdSig)
    w16(out, 0); w16(out, 0); w16(out, count); w16(out, count)
    w32(out, cd.length.toLong); w32(out, cdOffset.toLong)
    w16(out, commentBytes.length)
    out.write(commentBytes, 0, commentBytes.length)
    out.toByteArray
  }
}
