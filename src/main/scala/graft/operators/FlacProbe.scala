package graft.operators

/** FLAC CONTAINER probe (the public xiph.org format spec / RFC 9639):
  * the metadata-block walk an audio lake's prober runs over its
  * lossless payloads — the STREAMINFO bit-packed stream parameters
  * (sample rate in 20 bits, channels in 3, bit depth in 5, total
  * samples in 36), VORBIS_COMMENT tags (a LITTLE-endian structure
  * inside an otherwise big-endian container — the classic FLAC parsing
  * trap), padding accounting — and the exact walk any decoder must run
  * first.
  *
  * Scope mirrors [[MpegFrames]]: the CONTAINER is decoded, not the PCM.
  * FLAC audio frames (rice-coded subframes behind per-frame CRCs) are
  * counted as an opaque byte span after the last metadata block and
  * never fabricated; the prober supplies real container truth and the
  * decode operators surface such payloads as explicit nulls.
  *
  * Hostile-byte posture: [[probe]] never throws. A missing marker, a
  * first block that is not STREAMINFO, a wrong STREAMINFO length, a
  * block overrunning the payload, no last-block flag before
  * end-of-input, reserved block type 127, a vorbis-comment structure
  * overrunning its block, or a zero sample rate all yield None.
  */
object FlacProbe {

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** STREAMINFO, unpacked from its fixed 34-byte bit layout. */
  final case class StreamInfo(minBlock: Int, maxBlock: Int, minFrame: Int,
      maxFrame: Int, sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long)

  /** SEEKTABLE summary: real seek points (ascending sample numbers)
    * and trailing placeholder points (sample number all-ones), per the
    * spec's 18-byte point layout. Offsets are summed exactly so a
    * 32-bit misread of the 64-bit fields lands in any hash built on
    * this.
    */
  final case class SeekSummary(nPoints: Int, nPlaceholders: Int,
      firstSample: Long, lastSample: Long, offsetSum: Long)

  /** PICTURE block metadata (the FLAC-native APIC analogue): all
    * fields are BIG-endian — unlike the little-endian vorbis comment
    * this block often sits next to, which is exactly the trap worth
    * pinning. The image payload is counted, never decoded here (the
    * real image codecs live in [[MediaCodecs]]/[[JpegCodec]]).
    */
  final case class PictureInfo(picType: Int, mime: String, description: String,
      width: Long, height: Long, depth: Long, colors: Long, dataBytes: Long)

  /** Parsed container. `comments` holds the vorbis KEY=value pairs
    * (keys uppercased per the vorbis-comment convention, values
    * verbatim); `frameBytes` is the opaque audio span (counted, never
    * decoded); `seek`/`picture` decode the SEEKTABLE and first PICTURE
    * block when present (`nPictures` counts all of them).
    */
  final case class FlacInfo(info: StreamInfo, vendor: String,
      comments: Vector[(String, String)], nBlocks: Int, paddingBytes: Long,
      frameBytes: Long, seek: Option[SeekSummary] = None,
      picture: Option[PictureInfo] = None, nPictures: Int = 0) {
    def durationMs: Long =
      if (info.sampleRate > 0) info.totalSamples * 1000L / info.sampleRate
      else 0L
    def tag(key: String): Option[String] =
      comments.find(_._1 == key.toUpperCase).map(_._2)
  }

  /** Walk a stream: "fLaC" marker, then metadata blocks (first MUST be
    * STREAMINFO, exactly one last-block flag), then the opaque frame
    * span. None on any malformation; never throws.
    */
  def probe(b: Array[Byte]): Option[FlacInfo] = {
    if (b.length < 4 + 4 + 34) return None
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    var p = 4
    var last = false
    var first = true
    var si: StreamInfo = null
    var vendor = ""
    var comments = Vector.empty[(String, String)]
    var sawComment = false
    var nBlocks = 0
    var padding = 0L
    var seek: Option[SeekSummary] = None
    var picture: Option[PictureInfo] = None
    var nPictures = 0
    while (!last) {
      if (p + 4 > b.length) return None
      val hdr = b(p) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      if (typ == 127) return None // reserved, forbidden by the spec
      val len = be24(b, p + 1)
      val start = p + 4
      if (start + len > b.length) return None
      if (first && typ != 0) return None // STREAMINFO must come first
      typ match {
        case 0 =>
          if (!first || len != 34) return None
          // bytes 10..17 pack rate(20) | chan-1(3) | bps-1(5) | samples(36)
          val hi = (0 until 8).foldLeft(0L)((a, i) =>
            (a << 8) | (b(start + 10 + i) & 0xffL))
          val rate = (hi >>> 44).toInt
          if (rate == 0) return None
          si = StreamInfo(
            be16(b, start), be16(b, start + 2),
            be24(b, start + 4), be24(b, start + 7),
            rate,
            ((hi >>> 41) & 0x7).toInt + 1,
            ((hi >>> 36) & 0x1f).toInt + 1,
            hi & 0xfffffffffL)
        case 1 => padding += len
        case 4 =>
          if (sawComment) return None // at most one vorbis-comment block
          sawComment = true
          // LITTLE-endian lengths inside the big-endian container
          var q = start
          def take(k: Int): Option[Int] =
            if (q + k <= start + len) { val o = q; q += k; Some(o) } else None
          val vl = le32(b, take(4).getOrElse(return None))
          if (vl > len) return None
          val vo = take(vl.toInt).getOrElse(return None)
          vendor = new String(b, vo, vl.toInt, "UTF-8")
          val n = le32(b, take(4).getOrElse(return None))
          var i = 0L
          val cs = Vector.newBuilder[(String, String)]
          while (i < n) {
            val cl = le32(b, take(4).getOrElse(return None))
            if (cl > len) return None
            val co = take(cl.toInt).getOrElse(return None)
            val s = new String(b, co, cl.toInt, "UTF-8")
            val eq = s.indexOf('=')
            if (eq < 1) return None // a field must be KEY=value
            cs += ((s.substring(0, eq).toUpperCase, s.substring(eq + 1)))
            i += 1
          }
          if (q != start + len) return None // exact tiling of the block
          comments = cs.result()
        case 3 =>
          if (seek.nonEmpty) return None // at most one SEEKTABLE
          if (len % 18 != 0) return None // exact 18-byte point tiling
          val nPts = len / 18
          var q = start
          var nReal = 0
          var prevSample = -1L
          var placeholdersStarted = false
          var firstS = 0L; var lastS = 0L; var offSum = 0L
          var i = 0
          while (i < nPts) {
            val sample = be64(b, q)
            if (sample == -1L) placeholdersStarted = true
            else {
              // real points: strictly ascending, never after a placeholder
              if (placeholdersStarted || sample <= prevSample) return None
              if (nReal == 0) firstS = sample
              lastS = sample
              offSum += be64(b, q + 8)
              prevSample = sample
              nReal += 1
            }
            q += 18
            i += 1
          }
          seek = Some(SeekSummary(nReal, nPts - nReal, firstS, lastS, offSum))
        case 6 =>
          // PICTURE: all lengths BIG-endian, exact tiling of the block
          var q = start
          def take(k: Long): Option[Int] =
            if (k >= 0 && q + k <= start + len) {
              val o = q; q += k.toInt; Some(o)
            } else None
          val pt = be32(b, take(4).getOrElse(return None))
          if (pt > 20) return None // spec defines types 0..20
          val ml = be32(b, take(4).getOrElse(return None))
          val mo = take(ml).getOrElse(return None)
          val mime = new String(b, mo, ml.toInt, "ISO-8859-1")
          if (!mime.forall(c => c >= 0x20 && c <= 0x7e)) return None
          val dl = be32(b, take(4).getOrElse(return None))
          val dso = take(dl).getOrElse(return None)
          val desc = new String(b, dso, dl.toInt, "UTF-8")
          val w = be32(b, take(4).getOrElse(return None))
          val h = be32(b, take(4).getOrElse(return None))
          val depth = be32(b, take(4).getOrElse(return None))
          val colors = be32(b, take(4).getOrElse(return None))
          val datal = be32(b, take(4).getOrElse(return None))
          take(datal).getOrElse(return None) // counted, never decoded
          if (q != start + len) return None
          if (picture.isEmpty)
            picture = Some(PictureInfo(pt.toInt, mime, desc, w, h, depth,
              colors, datal))
          nPictures += 1
        case _ => () // application/cuesheet: structurally skipped
      }
      first = false
      nBlocks += 1
      p = start + len
    }
    if (si == null) return None
    Some(FlacInfo(si, vendor, comments, nBlocks, padding,
      (b.length - p).toLong, seek, picture, nPictures))
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format.
  // ------------------------------------------------------------------

  /** Synthesize a VALID FLAC container: marker, STREAMINFO from the
    * given parameters (deterministic MD5 filler — the MD5 field is raw
    * signature bytes, not derived data), an optional vorbis-comment
    * block, an optional padding block, then `frameLen` opaque filler
    * bytes standing where the (never-fabricated) audio frames would
    * sit. Real wire format — [[probe]] is not told anything the bytes
    * don't say.
    */
  def synth(minBlock: Int, maxBlock: Int, minFrame: Int, maxFrame: Int,
      sampleRate: Int, channels: Int, bitsPerSample: Int, totalSamples: Long,
      vendor: String, comments: Seq[(String, String)], withComment: Boolean,
      paddingLen: Int, frameLen: Int, fill: Int => Int,
      seekPoints: Seq[(Long, Long, Int)] = Nil, seekPlaceholders: Int = 0,
      picture: Option[(Int, String, String, Long, Long, Long, Long, Int)] = None)
      : Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(bitsPerSample >= 1 && bitsPerSample <= 32, s"bps $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val withSeek = seekPoints.nonEmpty || seekPlaceholders > 0
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val blocks = Seq(true) ++ (if (withSeek) Seq(true) else Nil) ++
      (if (picture.nonEmpty) Seq(true) else Nil) ++
      (if (withComment) Seq(true) else Nil) ++
      (if (paddingLen >= 0) Seq(true) else Nil)
    def header(typ: Int, len: Int, isLast: Boolean): Unit = {
      out.write((if (isLast) 0x80 else 0) | typ)
      out.write((len >> 16) & 0xff); out.write((len >> 8) & 0xff)
      out.write(len & 0xff)
    }
    val nBlocks = blocks.size
    var written = 0
    def nextIsLast: Boolean = { written += 1; written == nBlocks }
    // STREAMINFO
    header(0, 34, nextIsLast)
    out.write((minBlock >> 8) & 0xff); out.write(minBlock & 0xff)
    out.write((maxBlock >> 8) & 0xff); out.write(maxBlock & 0xff)
    Seq(minFrame, maxFrame).foreach { f =>
      out.write((f >> 16) & 0xff); out.write((f >> 8) & 0xff)
      out.write(f & 0xff)
    }
    val hi = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples
    (0 until 8).reverseIterator.foreach(i => out.write(((hi >> (8 * i)) & 0xff).toInt))
    (0 until 16).foreach(i => out.write((fill(i) * 31 + 7) & 0xff)) // MD5 bytes
    if (withSeek) {
      header(3, (seekPoints.size + seekPlaceholders) * 18, nextIsLast)
      def be64w(v: Long): Unit =
        (0 until 8).reverseIterator.foreach(i =>
          out.write(((v >> (8 * i)) & 0xff).toInt))
      seekPoints.foreach { case (sample, offset, frameSamples) =>
        be64w(sample); be64w(offset)
        out.write((frameSamples >> 8) & 0xff); out.write(frameSamples & 0xff)
      }
      (0 until seekPlaceholders).foreach { _ =>
        be64w(-1L); be64w(0L); out.write(0); out.write(0)
      }
    }
    picture.foreach { case (pt, mime, desc, w, h, depth, colors, dataLen) =>
      val mb = mime.getBytes("ISO-8859-1")
      val db = desc.getBytes("UTF-8")
      header(6, 4 + 4 + mb.length + 4 + db.length + 4 * 4 + 4 + dataLen,
        nextIsLast)
      def be32w(v: Long): Unit =
        (0 until 4).reverseIterator.foreach(i =>
          out.write(((v >> (8 * i)) & 0xff).toInt))
      be32w(pt.toLong)
      be32w(mb.length.toLong); out.write(mb, 0, mb.length)
      be32w(db.length.toLong); out.write(db, 0, db.length)
      be32w(w); be32w(h); be32w(depth); be32w(colors)
      be32w(dataLen.toLong)
      (0 until dataLen).foreach(i => out.write(fill(i + 64) & 0xff))
    }
    if (withComment) {
      val body = new java.io.ByteArrayOutputStream()
      def le(v: Int): Unit = {
        body.write(v & 0xff); body.write((v >> 8) & 0xff)
        body.write((v >> 16) & 0xff); body.write((v >> 24) & 0xff)
      }
      val vb = vendor.getBytes("UTF-8")
      le(vb.length); body.write(vb, 0, vb.length)
      le(comments.size)
      comments.foreach { case (k, vl) =>
        val cb = s"$k=$vl".getBytes("UTF-8")
        le(cb.length); body.write(cb, 0, cb.length)
      }
      val bb = body.toByteArray
      header(4, bb.length, nextIsLast)
      out.write(bb, 0, bb.length)
    }
    if (paddingLen >= 0) {
      header(1, paddingLen, nextIsLast)
      (0 until paddingLen).foreach(_ => out.write(0))
    }
    (0 until frameLen).foreach(i => out.write(fill(i) & 0xff))
    out.toByteArray
  }
}
