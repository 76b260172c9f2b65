package graft.operators

/** ID3v2 TAG walk (v2.2 / v2.3 / v2.4, the public informal standard at
  * id3.org — id3v2-00 §3, id3v2.3.0 §3, id3v2.4.0-structure §3-4): the
  * metadata layer an audio lake's prober reads off the front of nearly
  * every MP3 payload — title, artist, album, year, track — and the exact
  * frame walk any tag editor must run. [[MpegFrames.probe]] measures and
  * skips this tag wholesale; this operator decodes it.
  *
  * Scope, mirroring the other probers: the declared-size arithmetic and
  * the TEXT frame family (`T??`/`T???` except `TXX`/`TXXX`) are decoded;
  * every other frame (APIC/PIC pictures, PRIV blobs, COM...) is walked
  * structurally — its id and size validated, its body untouched — and
  * surfaced with a null text. All three version-specific layouts are
  * real: v2.2 frames carry 3-character ids with 3-byte big-endian sizes
  * and NO flags bytes (a 6-byte header — the old iTunes-era form), v2.3
  * frame sizes are plain big-endian 32-bit, v2.4 sizes are 7-bit
  * syncsafe; text encodings 00 (ISO-8859-1) and 01 (UCS-2/UTF-16 with
  * BOM) exist in all versions, 02 (UTF-16BE) and 03 (UTF-8) in v2.4
  * only.
  *
  * The v2.2/v2.3 whole-tag UNSYNCHRONISATION scheme is decoded for
  * real: when flag bit 7 is set, every FF 00 pair in the tag body
  * collapses back to FF before the frame walk (sizes and offsets per
  * the spec describe the decoded stream); v2.4's per-frame unsync
  * remains a decline.
  *
  * Hostile-byte posture: [[parse]] never throws. Truncated headers,
  * unsupported flag bits (extended header, footer, v2.4 unsync),
  * non-[A-Z0-9] frame ids, frame flag bits set (compression, encryption),
  * a frame overrunning the tag, an encoding code invalid for the version,
  * a BOM-less encoding-01 body, odd-length UTF-16, non-zero padding
  * bytes, or a frameless tag all yield None.
  */
object Id3 {

  /** One parsed frame. `encoding`/`text` are present for decoded text
    * frames, absent (-1 / None) for structurally-walked binary frames.
    * `size` is the declared body size (header excluded).
    */
  final case class Id3Frame(id: String, size: Int, encoding: Int,
      text: Option[String])

  /** Parsed tag. `tagBytes` includes the 10-byte header — exactly the
    * span [[MpegFrames.probe]] reports as `id3v2Bytes`.
    */
  final case class Id3Tag(major: Int, tagBytes: Int,
      frames: Vector[Id3Frame], paddingBytes: Int,
      unsync: Boolean = false) {
    def nFrames: Int = frames.length
    /** First decoded text for a frame id (tags may repeat ids). */
    def text(id: String): Option[String] =
      frames.find(_.id == id).flatMap(_.text)
  }

  private def syncsafe(b: Array[Byte], o: Int): Option[Int] = {
    val s = (0 until 4).map(i => b(o + i) & 0xff)
    if (s.exists(_ > 0x7f)) None
    else Some(s.foldLeft(0)((a, v) => (a << 7) | v))
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Parse an ID3v2.2/2.3/2.4 tag at the start of `b` (trailing bytes
    * beyond the declared tag size are the audio stream and are ignored
    * here).
    */
  def parse(b: Array[Byte]): Option[Id3Tag] = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return None
    val major = b(3) & 0xff
    if (major != 2 && major != 3 && major != 4) return None
    if ((b(4) & 0xff) == 0xff) return None // revision 0xff is forbidden
    val flags = b(5) & 0xff
    // bit 7 = unsynchronisation (whole-tag form, v2.2/v2.3); the other
    // flag bits (compression/ext-header/footer, per-frame v2.4 unsync)
    // stay declines
    val unsync = (flags & 0x80) != 0
    if ((flags & 0x7f) != 0) return None
    if (unsync && major == 4) return None // v2.4 unsync is per-frame
    val size = syncsafe(b, 6).getOrElse(return None)
    if (10 + size > b.length) return None
    // de-unsynchronisation: every FF 00 pair in the tag body collapses
    // back to FF (the scheme that keeps false MPEG sync words out of
    // the tag); frame offsets below are relative to the DECODED body
    val body: Array[Byte] =
      if (!unsync) java.util.Arrays.copyOfRange(b, 10, 10 + size)
      else {
        val out = new java.io.ByteArrayOutputStream(size)
        var i = 10
        while (i < 10 + size) {
          out.write(b(i))
          if ((b(i) & 0xff) == 0xff && i + 1 < 10 + size && b(i + 1) == 0)
            i += 2
          else i += 1
        }
        out.toByteArray
      }
    val end = body.length
    val tagSpan = 10 + size
    val idLen = if (major == 2) 3 else 4
    val hdrLen = if (major == 2) 6 else 10
    val txx = if (major == 2) "TXX" else "TXXX"
    var pos = 0
    val frames = Vector.newBuilder[Id3Frame]
    var padding = 0
    while (pos < end && padding == 0) {
      if (body(pos) == 0) {
        // padding runs to the end of the tag and must be all zeros
        var i = pos
        while (i < end) { if (body(i) != 0) return None; i += 1 }
        padding = end - pos
      } else {
        if (pos + hdrLen > end) return None
        val id = new String(body, pos, idLen, "US-ASCII")
        if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
          return None
        val fsz: Int = major match {
          case 2 =>
            ((body(pos + 3) & 0xff) << 16) | ((body(pos + 4) & 0xff) << 8) |
              (body(pos + 5) & 0xff)
          case 4 => syncsafe(body, pos + 4).getOrElse(return None)
          case _ =>
            val v = be32(body, pos + 4)
            if (v > Int.MaxValue) return None
            v.toInt
        }
        if (fsz < 1) return None // "a frame must be at least 1 byte big"
        if (major != 2 && (body(pos + 8) != 0 || body(pos + 9) != 0))
          return None // no frame flags (v2.2 frames have none at all)
        val bodyStart = pos + hdrLen
        if (fsz > end - bodyStart) return None
        if (id.startsWith("T") && id != txx) {
          val enc = body(bodyStart) & 0xff
          if (enc > (if (major == 4) 3 else 1)) return None
          val raw = java.util.Arrays.copyOfRange(body, bodyStart + 1, bodyStart + fsz)
          val decoded: String = enc match {
            case 0 => new String(raw, "ISO-8859-1")
            case 1 =>
              if (raw.length < 2 || raw.length % 2 != 0) return None
              val bom = ((raw(0) & 0xff) << 8) | (raw(1) & 0xff)
              if (bom == 0xfeff) new String(raw, 2, raw.length - 2, "UTF-16BE")
              else if (bom == 0xfffe) new String(raw, 2, raw.length - 2, "UTF-16LE")
              else return None
            case 2 =>
              if (raw.length % 2 != 0) return None
              new String(raw, "UTF-16BE")
            case _ => new String(raw, "UTF-8")
          }
          // one trailing NUL terminator is legal and not part of the text
          val text =
            if (decoded.nonEmpty && decoded.last == 0.toChar) decoded.init
            else decoded
          frames += Id3Frame(id, fsz, enc, Some(text))
        } else {
          frames += Id3Frame(id, fsz, -1, None)
        }
        pos = bodyStart + fsz
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) return None // spec: a tag MUST contain at least one frame
    Some(Id3Tag(major, tagSpan, fs, padding, unsync))
  }

  /** Synthesize a VALID ID3v2 tag: text frames as (id, text, encoding)
    * with the version's real size form and the encoding's real body
    * layout (encoding 01 carries a big-endian BOM), then binary frames
    * as (id, bytes) walked-not-decoded by [[parse]], then `padding`
    * zero bytes. Real wire format — [[parse]] is not told anything the
    * bytes don't say.
    */
  def synthTag(major: Int, textFrames: Seq[(String, String, Int)],
      padding: Int, binFrames: Seq[(String, Array[Byte])] = Nil,
      unsync: Boolean = false): Array[Byte] = {
    require(major == 2 || major == 3 || major == 4,
      s"unsupported ID3v2 major $major")
    require(!(unsync && major == 4), "v2.4 unsync is per-frame: not synthesized")
    require(padding >= 0)
    val idLen = if (major == 2) 3 else 4
    val body = new java.io.ByteArrayOutputStream()
    def frameHeader(id: String, fsz: Int): Unit = {
      require(id.length == idLen,
        s"frame id must be $idLen chars for v2.$major: '$id'")
      body.write(id.getBytes("US-ASCII"), 0, idLen)
      if (major == 2) {
        require(fsz < (1 << 24))
        Seq(16, 8, 0).foreach(sh => body.write((fsz >> sh) & 0xff))
      } else if (major == 4) {
        require(fsz < (1 << 28))
        Seq(21, 14, 7, 0).foreach(sh => body.write((fsz >> sh) & 0x7f))
      } else Seq(24, 16, 8, 0).foreach(sh => body.write((fsz >> sh) & 0xff))
      if (major != 2) { body.write(0); body.write(0) } // frame flags
    }
    textFrames.foreach { case (id, text, enc) =>
      require(enc >= 0 && enc <= (if (major == 4) 3 else 1),
        s"encoding $enc invalid for ID3v2.$major")
      val payload: Array[Byte] = enc match {
        case 0 => text.getBytes("ISO-8859-1")
        case 1 => Array(0xfe.toByte, 0xff.toByte) ++ text.getBytes("UTF-16BE")
        case 2 => text.getBytes("UTF-16BE")
        case _ => text.getBytes("UTF-8")
      }
      frameHeader(id, 1 + payload.length)
      body.write(enc)
      body.write(payload, 0, payload.length)
    }
    binFrames.foreach { case (id, bytes) =>
      require(bytes.nonEmpty, "a frame must be at least 1 byte big")
      frameHeader(id, bytes.length)
      body.write(bytes, 0, bytes.length)
    }
    (0 until padding).foreach(_ => body.write(0))
    val plain = body.toByteArray
    // unsynchronisation: every FF byte gains a 00 successor so no false
    // MPEG sync word survives inside the tag (the declared size counts
    // the ENCODED form)
    val bb =
      if (!unsync) plain
      else {
        val o = new java.io.ByteArrayOutputStream(plain.length)
        plain.foreach { x =>
          o.write(x)
          if ((x & 0xff) == 0xff) o.write(0)
        }
        o.toByteArray
      }
    require(bb.length < (1 << 28), "tag body exceeds the syncsafe size form")
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(major); out.write(0); out.write(if (unsync) 0x80 else 0)
    Seq(21, 14, 7, 0).foreach(sh => out.write((bb.length >> sh) & 0x7f))
    out.write(bb, 0, bb.length)
    out.toByteArray
  }
}
