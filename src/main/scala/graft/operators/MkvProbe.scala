package graft.operators

/** EBML / Matroska (MKV/WebM, RFC 8794 + the public matroska.org element
  * registry) CONTAINER probe: the element walk a media lake's prober runs
  * over the WebM half of its video payloads — doc type, timestamp scale,
  * duration, per-track type/codec/dimensions/audio parameters, cluster
  * and block accounting — and the exact structural walk any demuxer must
  * run first.
  *
  * Scope mirrors [[Mp4Boxes]]: the CONTAINER is decoded, never the
  * samples. SimpleBlock payloads are counted (their sizes still validate
  * the tiling) but their codec bitstreams (VP9/Opus/...) are not
  * fabricated. Unknown-size elements (the all-ones size form live
  * streams use) are explicitly out of scope: this prober requires every
  * declared size to be known and exact, which is what finished files
  * carry; an unknown-size element rejects the probe rather than
  * guessing where it ends.
  *
  * EBML notes embodied here (RFC 8794): element IDs keep their length
  * marker bits (0x1A45DFA3 is a 4-octet ID as written); data sizes drop
  * them; both use the leading-zero-count width scheme, 1-8 octets, and a
  * size may legally be encoded wider than minimal (muxers pad for
  * in-place editing) — the parser accepts any width, the synthesizer
  * emits fixed 2-octet sizes. Unsigned integers are big-endian with
  * leading zero octets permitted, 1-8 octets; floats are exactly 4 or 8
  * octets.
  *
  * Hostile-byte posture: [[probe]] never throws. Truncated varints,
  * reserved all-ones sizes, children that do not exactly tile their
  * parent, a missing EBML header or Segment, a malformed float width, or
  * an over-long integer all yield None.
  */
object MkvProbe {

  // element IDs (with marker bits), from the public Matroska registry
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdDocTypeVersion = 0x4287L
  private val IdDocTypeReadVersion = 0x4285L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdMuxingApp = 0x4d80L
  private val IdWritingApp = 0x5741L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackNumber = 0xd7L
  private val IdTrackUid = 0x73c5L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdAudio = 0xe1L
  private val IdSamplingFrequency = 0xb5L
  private val IdChannels = 0x9fL
  private val IdCluster = 0x1f43b675L
  private val IdTimestamp = 0xe7L
  private val IdSimpleBlock = 0xa3L

  /** One parsed element: id (marker bits kept) + body bounds. */
  final case class El(id: Long, start: Int, end: Int) {
    def len: Int = end - start
  }

  /** Read an element ID at `p`: width = leading-zero count of the first
    * octet + 1 (1-4 for IDs per the Matroska profile), marker bits KEPT.
    */
  private def readId(b: Array[Byte], p: Int, limit: Int): Option[(Long, Int)] = {
    if (p >= limit) return None
    val first = b(p) & 0xff
    if (first == 0) return None // width > 8: invalid
    val width = Integer.numberOfLeadingZeros(first) - 23 // 32-bit clz - 24 + 1
    if (width > 4 || p + width > limit) return None
    var v = first.toLong
    var i = 1
    while (i < width) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
    Some((v, width))
  }

  /** Read a data size at `p`: same width scheme, marker bit REMOVED;
    * the all-ones ("unknown size") form rejects — see scaladoc.
    */
  private def readSize(b: Array[Byte], p: Int, limit: Int): Option[(Long, Int)] = {
    if (p >= limit) return None
    val first = b(p) & 0xff
    if (first == 0) return None
    val width = Integer.numberOfLeadingZeros(first) - 23
    if (width > 8 || p + width > limit) return None
    var v = (first ^ (1 << (8 - width))).toLong
    var i = 1
    while (i < width) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
    if (v == (1L << (7 * width)) - 1) return None // unknown-size: declined
    Some((v, width))
  }

  /** Children exactly tiling [from, to): id + size + body per element;
    * None on any overrun, invalid varint, or trailing garbage.
    */
  private[graft] def walkEls(b: Array[Byte], from: Int, to: Int): Option[Vector[El]] = {
    val out = Vector.newBuilder[El]
    var p = from
    while (p < to) {
      val (id, iw) = readId(b, p, to).getOrElse(return None)
      val (sz, sw) = readSize(b, p + iw, to).getOrElse(return None)
      val bodyStart = p + iw + sw
      if (sz > (to - bodyStart).toLong) return None
      out += El(id, bodyStart, bodyStart + sz.toInt)
      p = bodyStart + sz.toInt
    }
    Some(out.result())
  }

  /** Big-endian unsigned integer body, 1-8 octets (leading zeros legal). */
  private def uint(b: Array[Byte], el: El): Option[Long] = {
    if (el.len < 1 || el.len > 8) return None
    var v = 0L
    var i = el.start
    while (i < el.end) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    Some(v)
  }

  /** Float body: exactly 4 or 8 octets (RFC 8794 §7.3). */
  private def float(b: Array[Byte], el: El): Option[Double] = el.len match {
    case 8 =>
      var v = 0L
      var i = el.start
      while (i < el.end) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      Some(java.lang.Double.longBitsToDouble(v))
    case 4 =>
      var v = 0
      var i = el.start
      while (i < el.end) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      Some(java.lang.Float.intBitsToFloat(v).toDouble)
    case _ => None
  }

  private def str(b: Array[Byte], el: El): String =
    new String(b, el.start, el.len, "UTF-8")

  /** One track: Matroska type code (1=video, 2=audio, 17=subtitle),
    * codec id string, video dimensions (0 when no Video element), audio
    * sampling rate/channels (0 when no Audio element).
    */
  final case class MkvTrack(number: Long, uid: Long, trackType: Long,
      codecId: String, width: Long, height: Long, sampleRate: Double,
      channels: Long)

  /** Parsed container. `durationTicks` is the Info Duration float in
    * timestamp-scale ticks; [[durationMs]] converts exactly for integer
    * tick counts. Block payload bytes are counted, never decoded.
    */
  final case class MkvInfo(docType: String, docTypeVersion: Long,
      timestampScale: Long, durationTicks: Double, muxingApp: String,
      writingApp: String, tracks: Vector[MkvTrack], clusterCount: Long,
      blockCount: Long, blockBytes: Long) {
    def nTracks: Int = tracks.length
    /** Floor-integer duration in ms: ticks x scale(ns) / 1e6. Exact for
      * integer tick counts below 2^53.
      */
    def durationMs: Long = (durationTicks.toLong * timestampScale) / 1000000L
  }

  /** Walk a whole stream: an EBML header (DocType matroska/webm) then
    * exactly one Segment holding Info, Tracks, and zero or more
    * Clusters. None on any malformation; never throws.
    */
  def probe(b: Array[Byte]): Option[MkvInfo] = {
    val tops = walkEls(b, 0, b.length).getOrElse(return None)
    if (tops.length != 2 || tops(0).id != IdEbml || tops(1).id != IdSegment)
      return None
    val hdr = walkEls(b, tops(0).start, tops(0).end).getOrElse(return None)
    val docType = hdr.find(_.id == IdDocType).map(str(b, _)).getOrElse(return None)
    if (docType != "matroska" && docType != "webm") return None
    val dtv = hdr.find(_.id == IdDocTypeVersion)
      .flatMap(uint(b, _)).getOrElse(1L)
    val seg = walkEls(b, tops(1).start, tops(1).end).getOrElse(return None)
    val infos = seg.filter(_.id == IdInfo)
    if (infos.size != 1) return None
    val info = walkEls(b, infos.head.start, infos.head.end).getOrElse(return None)
    val scale = info.find(_.id == IdTimestampScale)
      .map(uint(b, _).getOrElse(return None)).getOrElse(1000000L)
    if (scale < 1) return None
    val dur = info.find(_.id == IdDuration)
      .map(float(b, _).getOrElse(return None)).getOrElse(0.0)
    if (dur < 0) return None
    val mux = info.find(_.id == IdMuxingApp).map(str(b, _)).getOrElse("")
    val wri = info.find(_.id == IdWritingApp).map(str(b, _)).getOrElse("")
    val trackEls = seg.filter(_.id == IdTracks)
    if (trackEls.size != 1) return None
    val entries = walkEls(b, trackEls.head.start, trackEls.head.end)
      .getOrElse(return None)
    if (entries.isEmpty || entries.exists(_.id != IdTrackEntry)) return None
    val tracks = Vector.newBuilder[MkvTrack]
    entries.foreach { te =>
      val kids = walkEls(b, te.start, te.end).getOrElse(return None)
      def u(id: Long): Option[Long] =
        kids.find(_.id == id).map(uint(b, _).getOrElse(return None))
      val num = u(IdTrackNumber).getOrElse(return None)
      val uid = u(IdTrackUid).getOrElse(return None)
      val typ = u(IdTrackType).getOrElse(return None)
      val codec = kids.find(_.id == IdCodecId).map(str(b, _)).getOrElse(return None)
      var w = 0L; var h = 0L
      kids.find(_.id == IdVideo).foreach { v =>
        val vk = walkEls(b, v.start, v.end).getOrElse(return None)
        def vu(id: Long): Option[Long] =
          vk.find(_.id == id).map(uint(b, _).getOrElse(return None))
        w = vu(IdPixelWidth).getOrElse(return None)
        h = vu(IdPixelHeight).getOrElse(return None)
      }
      var rate = 0.0; var ch = 0L
      kids.find(_.id == IdAudio).foreach { a =>
        val ak = walkEls(b, a.start, a.end).getOrElse(return None)
        rate = ak.find(_.id == IdSamplingFrequency)
          .map(float(b, _).getOrElse(return None)).getOrElse(8000.0)
        ch = ak.find(_.id == IdChannels)
          .map(uint(b, _).getOrElse(return None)).getOrElse(1L)
      }
      tracks += MkvTrack(num, uid, typ, codec, w, h, rate, ch)
    }
    var nClusters = 0L; var nBlocks = 0L; var blockBytes = 0L
    seg.filter(_.id == IdCluster).foreach { cl =>
      nClusters += 1
      val kids = walkEls(b, cl.start, cl.end).getOrElse(return None)
      if (!kids.headOption.exists(_.id == IdTimestamp)) return None
      kids.tail.foreach { k =>
        if (k.id != IdSimpleBlock) return None
        // SimpleBlock: track-number varint + s16 relative time + flags,
        // then the codec payload (counted, untouched)
        if (k.len < 4) return None
        nBlocks += 1
        blockBytes += k.len
      }
    }
    Some(MkvInfo(docType, dtv, scale, dur, mux, wri, tracks.result(),
      nClusters, nBlocks, blockBytes))
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format, fixed 2-octet sizes.
  // ------------------------------------------------------------------

  /** Track parameters for [[synth]]: video tracks carry a Video element
    * (fixed 2-octet pixel fields), audio tracks an Audio element
    * (8-octet double rate, 1-octet channels).
    */
  final case class SynthMkvTrack(number: Long, uid: Long, trackType: Long,
      codecId: String, width: Long = 0, height: Long = 0,
      sampleRate: Double = 0, channels: Long = 0)

  /** One synthetic cluster: a timestamp plus SimpleBlock payload sizes
    * (each block gets the real 4-byte block header; payloads are
    * deterministic filler).
    */
  final case class SynthCluster(timestamp: Long, blockPayloads: Seq[Int])

  private def idBytes(id: Long): Array[Byte] = {
    val w = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    (0 until w).reverseIterator.map(i => ((id >> (8 * i)) & 0xff).toByte).toArray
  }

  /** Fixed 2-octet size form: 0x40 marker + 14-bit value. */
  private def size2(n: Int): Array[Byte] = {
    require(n >= 0 && n < 16383, s"size $n exceeds the 2-octet form")
    Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  }

  private def el(id: Long, body: Array[Byte]*): Array[Byte] = {
    val b = body.flatten.toArray
    idBytes(id) ++ size2(b.length) ++ b
  }

  private def uintBytes(v: Long, width: Int): Array[Byte] = {
    require(v >= 0 && (width == 8 || v < (1L << (8 * width))),
      s"uint $v does not fit $width octets")
    (0 until width).reverseIterator.map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  }

  private def doubleBytes(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).reverseIterator.map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
  }

  /** Synthesize a VALID Matroska/WebM stream: EBML header (DocType +
    * versions), Segment(Info(TimestampScale 3-octet, Duration 8-octet
    * double, Muxing/WritingApp), Tracks(TrackEntry...), Cluster...).
    * Every header is the real wire format — [[probe]] is not told
    * anything the bytes don't say.
    */
  def synth(docType: String, docTypeVersion: Long, timestampScale: Long,
      durationTicks: Double, muxingApp: String, writingApp: String,
      tracks: Seq[SynthMkvTrack], clusters: Seq[SynthCluster],
      fill: (Int, Int) => Int): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    val hdr = el(IdEbml,
      el(IdDocType, docType.getBytes("UTF-8")),
      el(IdDocTypeVersion, uintBytes(docTypeVersion, 1)),
      el(IdDocTypeReadVersion, uintBytes(2, 1)))
    val info = el(IdInfo,
      el(IdTimestampScale, uintBytes(timestampScale, 3)),
      el(IdDuration, doubleBytes(durationTicks)),
      el(IdMuxingApp, muxingApp.getBytes("UTF-8")),
      el(IdWritingApp, writingApp.getBytes("UTF-8")))
    val trackEls = tracks.map { t =>
      val media: Array[Byte] =
        if (t.trackType == 1)
          el(IdVideo,
            el(IdPixelWidth, uintBytes(t.width, 2)),
            el(IdPixelHeight, uintBytes(t.height, 2)))
        else if (t.trackType == 2)
          el(IdAudio,
            el(IdSamplingFrequency, doubleBytes(t.sampleRate)),
            el(IdChannels, uintBytes(t.channels, 1)))
        else Array.emptyByteArray
      el(IdTrackEntry,
        el(IdTrackNumber, uintBytes(t.number, 1)),
        el(IdTrackUid, uintBytes(t.uid, 1)),
        el(IdTrackType, uintBytes(t.trackType, 1)),
        el(IdCodecId, t.codecId.getBytes("UTF-8")),
        media)
    }
    val tracksEl = el(IdTracks, trackEls: _*)
    val clusterEls = clusters.zipWithIndex.map { case (c, ci) =>
      val blocks = c.blockPayloads.map { payLen =>
        // SimpleBlock header: track 1 as a 1-octet varint, s16 relative
        // timestamp 0, keyframe flag, then the (counted-only) payload
        val header = Array(0x81.toByte, 0.toByte, 0.toByte, 0x80.toByte)
        el(IdSimpleBlock, header ++
          Array.tabulate(payLen)(i => (fill(ci, i) & 0xff).toByte))
      }
      el(IdCluster,
        (el(IdTimestamp, uintBytes(c.timestamp, 2)) +: blocks): _*)
    }
    val segment = el(IdSegment, (info +: tracksEl +: clusterEls): _*)
    hdr ++ segment
  }
}
