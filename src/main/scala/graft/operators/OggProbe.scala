package graft.operators

/** OGG CONTAINER probe (RFC 3533 + the public Opus/Vorbis ID-header
  * layouts): the page walk a media lake's prober runs over its
  * .ogg/.opus payloads — page sequencing, lacing-value packet
  * reassembly, per-page CRC verification, codec identification from
  * the first packet, granule-position duration — and the exact walk
  * any demuxer must run first.
  *
  * The page checksum is Ogg's OWN CRC-32 (polynomial 0x04c11db7,
  * zero-initialized, unreflected, no final xor — NOT the zlib CRC),
  * computed over the whole page with the checksum field zeroed; every
  * page is verified, and a single bit flip anywhere in a page rejects
  * the probe. The polynomial is a public spec constant.
  *
  * Scope mirrors the other probers: the CONTAINER is decoded, not the
  * audio. Codec packets beyond the ID header (Opus/Vorbis frames) are
  * reassembled by lacing arithmetic and counted, never decoded.
  * [[probe]] handles the single-logical-stream files that dominate
  * speech/music corpora and rejects interleaved serials rather than
  * mis-attributing pages; [[probeMux]] demuxes concurrently-multiplexed
  * (multi-serial) physical streams per RFC 3533 §4.
  *
  * Hostile-byte posture: [[probe]] never throws. A missing capture
  * pattern, a nonzero version, a CRC mismatch, sequence gaps, a
  * missing BOS/EOS, pages after EOS, a truncated segment table or
  * body, or a malformed ID header all yield None.
  */
object OggProbe {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** Ogg's CRC-32: 0x04c11db7, init 0, unreflected, no final xor. */
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  /** The page CRC over [from, to) with the 4 checksum bytes at
    * `crcAt` treated as zero.
    */
  private[graft] def pageCrc(b: Array[Byte], from: Int, to: Int,
      crcAt: Int): Int = {
    var c = 0
    var i = from
    while (i < to) {
      val byte = if (i >= crcAt && i < crcAt + 4) 0 else b(i) & 0xff
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ byte) & 0xff)
      i += 1
    }
    c
  }

  /** Identified codec from the first packet. */
  final case class OggCodec(name: String, channels: Int, sampleRate: Long,
      preSkip: Int)

  /** Parsed physical stream (single logical stream). `finalGranule` is
    * the last page's granule position; for Opus that is the 48 kHz
    * sample count including pre-skip.
    */
  final case class OggInfo(serial: Long, nPages: Int, codec: OggCodec,
      finalGranule: Long, nPackets: Long, bodyBytes: Long,
      eos: Boolean) {
    /** Opus playback duration: (granule - preSkip) at the fixed 48 kHz
      * granule rate; for Vorbis the granule rate is the sample rate.
      */
    def durationMs: Long = codec.name match {
      case "opus" => (finalGranule - codec.preSkip).max(0L) * 1000 / 48000
      case _ if codec.sampleRate > 0 => finalGranule * 1000 / codec.sampleRate
      case _ => 0L
    }
  }

  /** One multiplexed logical stream's summary (see [[probeMux]]). */
  final case class MuxStream(serial: Long, nPages: Int, codec: OggCodec,
      finalGranule: Long, nPackets: Long, bodyBytes: Long) {
    def durationMs: Long = codec.name match {
      case "opus" => (finalGranule - codec.preSkip).max(0L) * 1000 / 48000
      case _ if codec.sampleRate > 0 => finalGranule * 1000 / codec.sampleRate
      case _ => 0L
    }
  }

  /** Walk a CONCURRENTLY-MULTIPLEXED physical stream (RFC 3533 §4: all
    * BOS pages first, then the logical streams' pages interleaved in
    * any order, each serial keeping its own consecutive sequence
    * numbering and exactly one EOS). [[probe]] deliberately rejects
    * these; this walk demuxes them — per-page CRC verification, lacing
    * packet accounting, and ID-header codec identification per serial.
    * Streams return in BOS order. None on any malformation (a BOS
    * after the BOS phase ended, a repeated serial, a sequence gap
    * within a serial, pages after that serial's EOS, a stream left
    * without EOS, or a packet left open at its stream's end); never
    * throws.
    */
  def probeMux(b: Array[Byte]): Option[Vector[MuxStream]] = {
    final class St(var seq: Long, var nPages: Int, var codec: OggCodec,
        var granule: Long, var nPackets: Long, var bodyBytes: Long,
        var continued: Boolean, var eos: Boolean)
    val order = Vector.newBuilder[Long]
    val states = scala.collection.mutable.LinkedHashMap.empty[Long, St]
    var bosPhase = true
    var p = 0
    while (p < b.length) {
      if (p + 27 > b.length) return None
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' || b(p + 3) != 'S')
        return None
      if (b(p + 4) != 0) return None
      val hType = b(p + 5) & 0xff
      if ((hType & 0xf8) != 0) return None
      val pGranule = le64(b, p + 6)
      val pSerial = le32(b, p + 14)
      val pSeq = le32(b, p + 18)
      val nSegs = b(p + 26) & 0xff
      val segTable = p + 27
      if (segTable + nSegs > b.length) return None
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += b(segTable + i) & 0xff; i += 1 }
      val body = segTable + nSegs
      val end = body + bodyLen
      if (end > b.length) return None
      if (pageCrc(b, p, end, p + 22) != le32(b, p + 22).toInt) return None
      if ((hType & 0x02) != 0) {
        // BOS: only during the opening phase, each serial once; RFC 3533
        // forbids the first page of a logical bitstream from carrying the
        // continued-packet flag (there is no prior page to continue from)
        if ((hType & 0x01) != 0) return None
        if (!bosPhase || states.contains(pSerial) || pSeq != 0) return None
        if (nSegs < 1 || (b(segTable + nSegs - 1) & 0xff) == 255) return None
        var j = 0
        while (j < nSegs - 1) {
          if ((b(segTable + j) & 0xff) != 255) return None
          j += 1
        }
        val codec = parseIdHeader(b, body, bodyLen).getOrElse(return None)
        val st = new St(0L, 0, codec, pGranule, 0L, 0L, false, false)
        states(pSerial) = st
        order += pSerial
      } else {
        bosPhase = false
        val st = states.getOrElse(pSerial, return None)
        if (st.eos) return None // pages after this serial's EOS
        if (pSeq != st.seq + 1) return None // per-serial sequence gap
        if (((hType & 0x01) != 0) != st.continued) return None
        st.seq = pSeq
      }
      val st = states(pSerial)
      i = 0
      while (i < nSegs) {
        if ((b(segTable + i) & 0xff) < 255) st.nPackets += 1
        i += 1
      }
      st.continued = nSegs > 0 && (b(segTable + nSegs - 1) & 0xff) == 255
      if ((hType & 0x04) != 0) st.eos = true
      st.granule = pGranule
      st.nPages += 1
      st.bodyBytes += bodyLen
      p = end
    }
    val serials = order.result()
    if (serials.isEmpty) return None
    val out = serials.map { s =>
      val st = states(s)
      if (!st.eos || st.continued) return None
      MuxStream(s, st.nPages, st.codec, st.granule, st.nPackets, st.bodyBytes)
    }
    Some(out)
  }

  /** Walk a whole stream: consecutive pages of one serial, BOS on the
    * first (which must hold exactly one terminated packet: the ID
    * header), EOS on the last, verified CRC on every page. None on any
    * malformation; never throws.
    */
  def probe(b: Array[Byte]): Option[OggInfo] = {
    var p = 0
    var serial = -1L
    var seq = -1L
    var nPages = 0
    var nPackets = 0L
    var bodyBytes = 0L
    var granule = 0L
    var sawEos = false
    var codec: OggCodec = null
    var continued = false // a packet is open across the page boundary
    while (p < b.length) {
      if (sawEos) return None // pages after EOS
      if (p + 27 > b.length) return None
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' || b(p + 3) != 'S')
        return None
      if (b(p + 4) != 0) return None // stream structure version
      val hType = b(p + 5) & 0xff
      if ((hType & 0xf8) != 0) return None // reserved flag bits
      val pGranule = le64(b, p + 6)
      val pSerial = le32(b, p + 14)
      val pSeq = le32(b, p + 18)
      val nSegs = b(p + 26) & 0xff
      val segTable = p + 27
      if (segTable + nSegs > b.length) return None
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += b(segTable + i) & 0xff; i += 1 }
      val body = segTable + nSegs
      val end = body + bodyLen
      if (end > b.length) return None
      if (pageCrc(b, p, end, p + 22) != le32(b, p + 22).toInt) return None
      if (nPages == 0) {
        if ((hType & 0x02) == 0) return None // first page must be BOS
        if ((hType & 0x01) != 0) return None // RFC 3533: BOS is never a continuation
        if (pSeq != 0) return None
        serial = pSerial
        // the ID header: exactly one packet, terminated on this page
        // (every lacing but the last saturated, the last < 255)
        if (nSegs < 1 || (b(segTable + nSegs - 1) & 0xff) == 255) return None
        var j = 0
        while (j < nSegs - 1) {
          if ((b(segTable + j) & 0xff) != 255) return None
          j += 1
        }
        codec = parseIdHeader(b, body, bodyLen).getOrElse(return None)
      } else {
        if ((hType & 0x02) != 0) return None // a second BOS
        if (pSerial != serial) return None // multiplexing: out of scope
        if (pSeq != seq + 1) return None // a sequence gap
        if (((hType & 0x01) != 0) != continued) return None // continuation flag truth
      }
      // packets end at each lacing value < 255
      i = 0
      while (i < nSegs) {
        if ((b(segTable + i) & 0xff) < 255) nPackets += 1
        i += 1
      }
      continued = nSegs > 0 && (b(segTable + nSegs - 1) & 0xff) == 255
      if ((hType & 0x04) != 0) sawEos = true
      granule = pGranule
      seq = pSeq
      nPages += 1
      bodyBytes += bodyLen
      p = end
    }
    if (nPages == 0 || !sawEos || continued || codec == null) return None
    Some(OggInfo(serial, nPages, codec, granule, nPackets, bodyBytes,
      sawEos))
  }

  /** OpusHead (RFC 7845 §5.1) or the Vorbis ID header (the public
    * Vorbis I spec §4.2.2); anything else is an unknown codec with the
    * packet preserved as a counted payload.
    */
  private def parseIdHeader(b: Array[Byte], at: Int, len: Int): Option[OggCodec] = {
    if (len >= 19 && new String(b, at, 8, "ISO-8859-1") == "OpusHead") {
      if ((b(at + 8) & 0xff) != 1) return None // OpusHead version
      val channels = b(at + 9) & 0xff
      if (channels < 1) return None
      val preSkip = le16(b, at + 10)
      val rate = le32(b, at + 12)
      Some(OggCodec("opus", channels, rate, preSkip))
    } else if (len >= 30 && (b(at) & 0xff) == 1 &&
      new String(b, at + 1, 6, "ISO-8859-1") == "vorbis") {
      if (le32(b, at + 7) != 0L) return None // vorbis_version must be 0
      val channels = b(at + 11) & 0xff
      if (channels < 1) return None
      val rate = le32(b, at + 12)
      if (rate < 1) return None
      // framing bit must terminate the header
      if ((b(at + len - 1) & 0x01) != 1) return None
      Some(OggCodec("vorbis", channels, rate, 0))
    } else {
      Some(OggCodec("unknown", 0, 0L, 0))
    }
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format, true CRCs.
  // ------------------------------------------------------------------

  /** One synthetic page: granule position and whole-packet sizes laid
    * out on this page (no cross-page packets in the synthesized form;
    * the parser still handles them via the lacing rules).
    */
  final case class SynthPage(granule: Long, packetSizes: Seq[Int])

  /** The Opus ID packet: OpusHead v1, the given channel count,
    * pre-skip, input rate, zero gain, mapping family 0.
    */
  def opusHead(channels: Int, preSkip: Int, inputRate: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OpusHead".getBytes("ISO-8859-1"), 0, 8)
    out.write(1); out.write(channels)
    out.write(preSkip & 0xff); out.write((preSkip >> 8) & 0xff)
    var i = 0
    while (i < 4) { out.write(((inputRate >> (8 * i)) & 0xff).toInt); i += 1 }
    out.write(0); out.write(0) // output gain
    out.write(0) // mapping family
    out.toByteArray
  }

  /** The Vorbis ID packet: type 1 + "vorbis", version 0, channels,
    * rate, three bitrate fields, blocksizes 2048/256, framing bit.
    */
  def vorbisHead(channels: Int, rate: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1)
    out.write("vorbis".getBytes("ISO-8859-1"), 0, 6)
    (0 until 4).foreach(_ => out.write(0)) // vorbis_version 0
    out.write(channels)
    (0 until 4).foreach(i => out.write(((rate >> (8 * i)) & 0xff).toInt))
    (0 until 12).foreach(_ => out.write(0)) // bitrate max/nominal/min
    out.write(0xb8) // blocksize_0 = 2^8, blocksize_1 = 2^11
    out.write(1) // framing bit
    out.toByteArray
  }

  /** Synthesize a VALID single-stream file: a BOS page carrying exactly
    * the `idPacket`, then one page per [[SynthPage]] (EOS on the last),
    * consecutive sequence numbers, true Ogg CRCs, 255-lacing packet
    * segmentation, deterministic payload filler. Real wire format —
    * [[probe]] is not told anything the bytes don't say.
    */
  /** One complete page as bytes: header, lacing table, packet bodies,
    * true CRC.
    */
  private def buildPage(serial: Long, seq: Long, granule: Long, hType: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacings = packets.flatMap { pk =>
      val full = pk.length / 255
      Seq.fill(full)(255) :+ (pk.length % 255)
    }
    require(lacings.size <= 255, "too many segments for one page")
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("ISO-8859-1"), 0, 4)
    out.write(0); out.write(hType)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((seq >> (8 * i)) & 0xff).toInt))
    val crcAt = out.size()
    (0 until 4).foreach(_ => out.write(0))
    out.write(lacings.size)
    lacings.foreach(out.write)
    packets.foreach(pk => out.write(pk, 0, pk.length))
    val page = out.toByteArray
    val crc = pageCrc(page, 0, page.length, crcAt)
    page(crcAt) = (crc & 0xff).toByte
    page(crcAt + 1) = ((crc >> 8) & 0xff).toByte
    page(crcAt + 2) = ((crc >> 16) & 0xff).toByte
    page(crcAt + 3) = ((crc >> 24) & 0xff).toByte
    page
  }

  def synth(serial: Long, idPacket: Array[Byte], pages: Seq[SynthPage],
      fill: (Int, Int) => Int): Array[Byte] = {
    require(idPacket.length < 255 * 255, "id packet too large")
    val out = new java.io.ByteArrayOutputStream()
    def writePage(seq: Long, granule: Long, hType: Int,
        packets: Seq[Array[Byte]]): Unit = {
      val page = buildPage(serial, seq, granule, hType, packets)
      out.write(page, 0, page.length)
    }
    writePage(0, 0, 0x02, Seq(idPacket))
    pages.zipWithIndex.foreach { case (pg, i) =>
      val packets = pg.packetSizes.zipWithIndex.map { case (sz, j) =>
        Array.tabulate(sz)(k => (fill(i * 31 + j, k) & 0xff).toByte)
      }
      val hType = if (i == pages.size - 1) 0x04 else 0
      writePage(i + 1, pg.granule, hType, packets)
    }
    if (pages.isEmpty) {
      // single-page stream: rewrite as one BOS+EOS page
      val page = out.toByteArray
      out.reset()
      val patched = page.clone()
      patched(5) = (patched(5) | 0x04).toByte
      // CRC must be recomputed after the flag change
      patched(22) = 0; patched(23) = 0; patched(24) = 0; patched(25) = 0
      val crc = pageCrc(patched, 0, patched.length, 22)
      patched(22) = (crc & 0xff).toByte
      patched(23) = ((crc >> 8) & 0xff).toByte
      patched(24) = ((crc >> 16) & 0xff).toByte
      patched(25) = ((crc >> 24) & 0xff).toByte
      out.write(patched, 0, patched.length)
    }
    out.toByteArray
  }

  /** Synthesize a VALID concurrently-multiplexed physical stream (RFC
    * 3533 §4): every logical stream's BOS page first (in list order),
    * then the data pages interleaved round-robin, EOS on each stream's
    * last page, per-serial sequence numbers, true CRCs. Real wire
    * format — [[probeMux]] is not told anything the bytes don't say.
    */
  def synthMux(streams: Seq[(Long, Array[Byte], Seq[SynthPage])],
      fill: (Int, Int) => Int): Array[Byte] = {
    require(streams.nonEmpty, "at least one logical stream")
    require(streams.map(_._1).distinct.size == streams.size,
      "serials must be distinct")
    require(streams.forall(_._3.nonEmpty),
      "each stream needs at least one data page (EOS rides the last)")
    val out = new java.io.ByteArrayOutputStream()
    def w(a: Array[Byte]): Unit = out.write(a, 0, a.length)
    streams.foreach { case (serial, idPacket, _) =>
      w(buildPage(serial, 0, 0, 0x02, Seq(idPacket)))
    }
    // round-robin interleave: one page from each stream with pages left
    val maxPages = streams.map(_._3.size).max
    (0 until maxPages).foreach { i =>
      streams.zipWithIndex.foreach { case ((serial, _, pages), si) =>
        if (i < pages.size) {
          val pg = pages(i)
          val packets = pg.packetSizes.zipWithIndex.map { case (sz, j) =>
            Array.tabulate(sz)(k =>
              (fill(si * 97 + i * 31 + j, k) & 0xff).toByte)
          }
          val hType = if (i == pages.size - 1) 0x04 else 0
          w(buildPage(serial, i + 1L, pg.granule, hType, packets))
        }
      }
    }
    out.toByteArray
  }
}
