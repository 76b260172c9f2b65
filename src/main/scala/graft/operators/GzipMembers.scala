package graft.operators

/** GZIP MEMBER walk (RFC 1952): the member-boundary scan a crawl lake
  * runs over its `.warc.gz` payloads — Common Crawl ships one gzip
  * member PER RECORD so consumers can seek to a member and decompress
  * just that record; building that index IS this walk. Each member's
  * header (with the optional FEXTRA/FNAME/FCOMMENT/FHCRC fields) is
  * parsed, its raw-deflate stream is REALLY decompressed with the JDK
  * `Inflater` to find the member end, and the 8-byte trailer's CRC-32
  * and ISIZE are verified against the decompressed bytes — corruption
  * yields None, never a silently wrong boundary.
  *
  * This complements `sources.CompressedIngest` (whole-file Hadoop
  * codecs on the scan path): here the members are DATA — a binary
  * column probed row by row, boundaries and checksums surfaced as
  * queryable facts.
  *
  * Hostile-byte posture: [[walk]] never throws. A wrong magic, an
  * unknown compression method, reserved flag bits, a truncated header
  * field, a malformed deflate stream, a trailer CRC/ISIZE mismatch, or
  * trailing garbage after the last member all yield None.
  */
object GzipMembers {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** One member: its span in the file, the decompressed content, and
    * the optional FNAME from the header.
    */
  final case class GzMember(offset: Int, compressedLength: Int,
      content: Array[Byte], name: Option[String])

  /** Walk concatenated members to the exact end of input. */
  def walk(b: Array[Byte]): Option[Vector[GzMember]] = {
    val out = Vector.newBuilder[GzMember]
    var p = 0
    if (b.isEmpty) return None
    while (p < b.length) {
      val start = p
      if (p + 10 > b.length) return None
      if ((b(p) & 0xff) != 0x1f || (b(p + 1) & 0xff) != 0x8b) return None
      if ((b(p + 2) & 0xff) != 8) return None // deflate only
      val flg = b(p + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved flag bits
      p += 10 // MTIME/XFL/OS are carried, not validated
      if ((flg & 0x04) != 0) { // FEXTRA
        if (p + 2 > b.length) return None
        val xlen = le16(b, p)
        p += 2 + xlen
        if (p > b.length) return None
      }
      var name: Option[String] = None
      if ((flg & 0x08) != 0) { // FNAME: zero-terminated ISO-8859-1
        val z = b.indexOf(0.toByte, p)
        if (z < 0) return None
        name = Some(new String(b, p, z - p, "ISO-8859-1"))
        p = z + 1
      }
      if ((flg & 0x10) != 0) { // FCOMMENT
        val z = b.indexOf(0.toByte, p)
        if (z < 0) return None
        p = z + 1
      }
      if ((flg & 0x02) != 0) { // FHCRC: CRC-16 = low 16 bits of the CRC-32
        if (p + 2 > b.length) return None
        val hc = new java.util.zip.CRC32() // over the header bytes [start, p)
        hc.update(b, start, p - start)
        if ((hc.getValue & 0xffffL) != le16(b, p)) return None
        p += 2
      }
      // raw-deflate to the member end; bytesRead gives the boundary
      val inf = new java.util.zip.Inflater(true)
      val content = try {
        inf.setInput(b, p, b.length - p)
        val chunks = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val k = try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
          if (k == 0 && !inf.finished()) return None // truncated stream
          chunks.write(buf, 0, k)
          if (chunks.size() > (b.length.toLong + 16) * 1100) return None
        }
        p += inf.getBytesRead.toInt
        chunks.toByteArray
      } finally inf.end()
      if (p + 8 > b.length) return None
      val crc = new java.util.zip.CRC32()
      crc.update(content)
      if (le32(b, p) != crc.getValue) return None
      if (le32(b, p + 4) != (content.length.toLong & 0xffffffffL)) return None
      p += 8
      out += GzMember(start, p - start, content, name)
    }
    Some(out.result())
  }

  /** Synthesize concatenated members. `storedBlock` selects the
    * closed-form raw-deflate encoding (one BTYPE=00 block: member size
    * = 23 + content + FNAME bytes — see [[ZipProbe.storedBlock]]);
    * otherwise the JDK Deflater really compresses. Real wire format
    * with true CRC-32/ISIZE trailers.
    */
  def synth(members: Seq[(Array[Byte], Option[String])],
      storedBlock: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (content, name) =>
      out.write(0x1f); out.write(0x8b); out.write(8)
      out.write(if (name.isDefined) 0x08 else 0)
      (0 until 4).foreach(_ => out.write(0)) // MTIME
      out.write(0); out.write(255) // XFL, OS unknown
      name.foreach { nm =>
        val nb = nm.getBytes("ISO-8859-1")
        out.write(nb, 0, nb.length); out.write(0)
      }
      val data =
        if (storedBlock) ZipProbe.storedBlock(content)
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(content); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          d.end()
          buf.toByteArray
        }
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(content)
      (0 until 4).foreach(i => out.write(((crc.getValue >> (8 * i)) & 0xff).toInt))
      (0 until 4).foreach(i =>
        out.write(((content.length.toLong >> (8 * i)) & 0xff).toInt))
    }
    out.toByteArray
  }
}
