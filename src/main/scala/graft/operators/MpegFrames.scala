package graft.operators

/** MPEG-1 audio (MP1/MP2/MP3) FRAME-LEVEL decode: header parse, frame-size
  * arithmetic, sync walk, ID3 tag handling — the container layer a media
  * lake's prober extracts (codec, bitrate profile, sample rate, duration)
  * from the billions of audio payloads it curates, and the exact walk any
  * full decoder must run first.
  *
  * Scope is deliberate and explicit: this operator decodes the FRAMING, not
  * the PCM. MPEG audio PCM reconstruction requires the ISO 11172-3 Annex B
  * window tables (512 tabulated prototype-filter coefficients with no
  * generating formula); this library does not embed data it cannot derive
  * or verify, and it never fabricates sample data — payloads whose PCM it
  * cannot reconstruct surface as EXPLICIT NULLS from the decode operators
  * (see [[Multimodal.decodeFeatures]]), with this prober still supplying
  * the real container metadata.
  *
  * All tables here are small public spec constants (ISO 11172-3 §2.4.2.3:
  * bitrate and sampling-frequency codes), not tabulated signal data.
  */
object MpegFrames {

  /** kbps by (layer 1/2/3)(bitrate index 1..14); index 0 = free format
    * (out of scope), 15 = forbidden.
    */
  private val BitrateKbps: Array[Array[Int]] = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))

  private val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per frame in MPEG-1: Layer I = 384, Layers II/III = 1152. */
  def samplesPerFrame(layer: Int): Int = if (layer == 1) 384 else 1152

  /** kbps for a (layer, bitrate-index) pair; index must be 1..14. */
  def bitrateKbps(layer: Int, idx: Int): Int = BitrateKbps(layer - 1)(idx)

  /** Frame length in bytes (header included) from the spec arithmetic:
    * Layer I counts in 4-byte slots, II/III in bytes; integer division.
    */
  def frameBytes(layer: Int, bitrateKbps: Int, sampleRate: Int,
      padded: Boolean): Int = {
    val pad = if (padded) 1 else 0
    if (layer == 1) (12000 * bitrateKbps / sampleRate + pad) * 4
    else 144000 * bitrateKbps / sampleRate + pad
  }

  final case class MpegFrame(offset: Int, bitrateKbps: Int, padded: Boolean)

  /** Parsed Xing ("Xing" = VBR) / Info ("Info" = CBR) tag from the first
    * Layer III frame: optional frame/byte totals, TOC presence, quality —
    * the header VBR encoders write so players can seek and length-report
    * without walking every frame. All fields big-endian per the public
    * layout; absent fields are None, an absent tag is a None tag (not an
    * error).
    */
  final case class XingTag(vbr: Boolean, frames: Option[Long],
      bytes: Option[Long], toc: Boolean, quality: Option[Long])

  final case class MpegInfo(layer: Int, sampleRate: Int, channels: Int,
      id3v2Bytes: Int, id3v1: Boolean, frames: Vector[MpegFrame],
      xing: Option[XingTag] = None) {
    def nFrames: Int = frames.length
    def nSamples: Long = frames.length.toLong * samplesPerFrame(layer)
    /** Floor-integer playback duration — exact cross-engine arithmetic. */
    def durationMs: Long = nSamples * 1000L / sampleRate
  }

  /** Walk an MPEG-1 audio stream: optional ID3v2 prefix (syncsafe size),
    * then consecutive frames — every frame must share the stream's layer
    * and sample rate (bitrate and padding free to vary per frame: VBR) —
    * then an optional 128-byte ID3v1 "TAG" trailer, then end-of-input.
    * None (never throw) on: missing sync, reserved version/layer/rate
    * codes, free-format or forbidden bitrate, mid-stream parameter
    * changes, a frame overrunning the payload, or trailing garbage.
    */
  def probe(b: Array[Byte]): Option[MpegInfo] = {
    var pos = 0
    var id3v2 = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2: 10-byte header, 4 syncsafe size bytes (7 bits each)
      val s = Seq(6, 7, 8, 9).map(i => b(i) & 0xff)
      if (s.exists(_ > 0x7f)) return None
      id3v2 = 10 + s.foldLeft(0)((a, v) => (a << 7) | v)
      pos = id3v2
      if (pos > b.length) return None
    }
    var layer = -1; var rate = -1; var channels = -1
    val frames = Vector.newBuilder[MpegFrame]
    var n = 0
    while (pos < b.length &&
      !(b.length - pos == 128 && b(pos) == 'T' && b(pos + 1) == 'A' &&
        b(pos + 2) == 'G')) {
      if (pos + 4 > b.length) return None
      val h = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
        ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      if ((h >>> 21) != 0x7ff) return None // 11-bit sync
      if (((h >>> 19) & 3) != 3) return None // MPEG-1 only
      val ly = 4 - ((h >>> 17) & 3) // code 3=Layer I ... 1=Layer III
      if (ly == 4) return None // layer code 0 reserved
      val brIdx = (h >>> 12) & 15
      if (brIdx == 0 || brIdx == 15) return None // free/forbidden
      val srIdx = (h >>> 10) & 3
      if (srIdx == 3) return None // reserved
      if ((h & 3) == 2) return None // reserved emphasis
      val sr = SampleRates(srIdx)
      val ch = if (((h >>> 6) & 3) == 3) 1 else 2
      if (layer < 0) { layer = ly; rate = sr; channels = ch }
      else if (ly != layer || sr != rate || ch != channels) return None
      val kbps = BitrateKbps(ly - 1)(brIdx)
      val len = frameBytes(ly, kbps, sr, padded = ((h >>> 9) & 1) == 1)
      if (pos + len > b.length || len <= 4) return None
      frames += MpegFrame(pos, kbps, ((h >>> 9) & 1) == 1)
      n += 1
      pos += len
    }
    if (n == 0) return None
    val id3v1 = pos < b.length // only reachable via the TAG match above
    val fs = frames.result()
    Some(MpegInfo(layer, rate, channels, id3v2, id3v1, fs,
      parseXing(b, fs.head, layer, rate, channels)))
  }

  /** Xing/Info tag lookup in the FIRST frame (Layer III only — the tag
    * sits right after the side info, 17 bytes mono / 32 stereo for
    * MPEG-1). In a CRC-protected stream (protection bit 0) the 16-bit CRC
    * sits between the header and the side info, shifting the tag by 2
    * bytes — the protection bit is re-read from the first frame's header
    * so CRC'd VBR files report their tag instead of a silent None.
    * Returns None when absent or when a declared field would overrun the
    * frame; never throws.
    */
  private def parseXing(b: Array[Byte], f0: MpegFrame, layer: Int,
      rate: Int, channels: Int): Option[XingTag] = {
    if (layer != 3) return None
    val frameEnd = f0.offset + frameBytes(layer, f0.bitrateKbps, rate, f0.padded)
    // protection_bit (header bit 16): 0 = a 16-bit CRC follows the header
    val crcBytes = if (((b(f0.offset + 1) & 0x01)) == 0) 2 else 0
    var p = f0.offset + 4 + crcBytes + (if (channels == 1) 17 else 32)
    if (p + 8 > frameEnd || p + 8 > b.length) return None
    val tag = new String(b.slice(p, p + 4), "US-ASCII")
    if (tag != "Xing" && tag != "Info") return None
    def be32(o: Int): Long = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val flags = be32(p + 4)
    p += 8
    def take(n: Int): Option[Int] =
      if (p + n <= frameEnd && p + n <= b.length) { val o = p; p += n; Some(o) }
      else None
    val frames = if ((flags & 1) != 0) take(4).map(be32) else None
    if ((flags & 1) != 0 && frames.isEmpty) return None
    val bytes = if ((flags & 2) != 0) take(4).map(be32) else None
    if ((flags & 2) != 0 && bytes.isEmpty) return None
    val toc = (flags & 4) != 0
    if (toc && take(100).isEmpty) return None
    val quality = if ((flags & 8) != 0) take(4).map(be32) else None
    if ((flags & 8) != 0 && quality.isEmpty) return None
    Some(XingTag(tag == "Xing", frames, bytes, toc, quality))
  }

  /** Synthesize a VALID MPEG-1 stream for the probe: per frame a real
    * header (given layer, sample-rate index, bitrate index, padding,
    * mono, no CRC) followed by deterministic filler bytes
    * (`fill(frameOrdinal, byteOrdinal)`), optionally wrapped in ID3v2 /
    * ID3v1 tags. The headers are the real wire format — [[probe]] is not
    * told anything the bytes don't say.
    */
  def synthStream(layer: Int, srIdx: Int, frames: Seq[(Int, Boolean)],
      fill: (Int, Int) => Int, id3v2Body: Int = -1,
      id3v1: Boolean = false, xing: Option[XingTag] = None,
      channels: Int = 1, crc: Boolean = false): Array[Byte] = {
    require(layer >= 1 && layer <= 3 && srIdx >= 0 && srIdx <= 2)
    require(channels == 1 || channels == 2)
    require(xing.isEmpty || layer == 3, "Xing tags are a Layer III structure")
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Body >= 0) {
      require(id3v2Body < (1 << 28))
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      Seq(21, 14, 7, 0).foreach(sh => out.write((id3v2Body >> sh) & 0x7f))
      (0 until id3v2Body).foreach(i => out.write(i % 251))
    }
    frames.zipWithIndex.foreach { case ((brIdx, padded), fi) =>
      require(brIdx >= 1 && brIdx <= 14)
      val kbps = BitrateKbps(layer - 1)(brIdx)
      val len = frameBytes(layer, kbps, SampleRates(srIdx), padded)
      val layerCode = 4 - layer
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      // protection bit: 1 = no CRC, 0 = 16-bit CRC follows the header
      frame(1) = (0xe0 | (3 << 3) | (layerCode << 1) | (if (crc) 0 else 1)).toByte
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (if (padded) 2 else 0)).toByte
      // mode 11 = single_channel, 00 = stereo; no flags, emphasis 0
      frame(3) = (if (channels == 1) 3 << 6 else 0).toByte
      val crcBytes = if (crc) 2 else 0
      if (crc) { frame(4) = 0xbe.toByte; frame(5) = 0xef.toByte } // placeholder CRC
      var start = 4 + crcBytes
      if (fi == 0 && xing.isDefined) {
        // MPEG-1 Layer III side info: 17 zeroed bytes mono / 32 stereo
        // (after the CRC when present), then the tag
        val side = if (channels == 1) 17 else 32
        val x = xing.get
        val need = 4 + crcBytes + side + 8 + x.frames.size * 4 + x.bytes.size * 4 +
          (if (x.toc) 100 else 0) + x.quality.size * 4
        require(need <= len, s"Xing tag ($need bytes) overruns the $len-byte frame")
        var p = 4 + crcBytes + side
        def put32(v: Long): Unit = {
          frame(p) = (v >>> 24).toByte; frame(p + 1) = (v >>> 16).toByte
          frame(p + 2) = (v >>> 8).toByte; frame(p + 3) = v.toByte
          p += 4
        }
        val tag = if (x.vbr) "Xing" else "Info"
        tag.getBytes("US-ASCII").zipWithIndex.foreach { case (c, k) =>
          frame(p + k) = c
        }
        p += 4
        put32((if (x.frames.isDefined) 1 else 0) |
          (if (x.bytes.isDefined) 2 else 0) | (if (x.toc) 4 else 0) |
          (if (x.quality.isDefined) 8 else 0))
        x.frames.foreach(put32)
        x.bytes.foreach(put32)
        if (x.toc) { (0 until 100).foreach(k => frame(p + k) = (k * 255 / 99).toByte); p += 100 }
        x.quality.foreach(put32)
        start = p
      }
      (start until len).foreach(j => frame(j) = (fill(fi, j) & 0xff).toByte)
      out.write(frame)
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      (3 until 128).foreach(i => out.write(0))
    }
    out.toByteArray
  }
}
