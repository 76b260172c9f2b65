package graft.operators

/** ISO-BMFF (MP4/MOV family, ISO/IEC 14496-12) CONTAINER probe: the box
  * walk a media lake's prober runs over the billions of video payloads it
  * curates — brand, movie timescale/duration, track count, handler types,
  * codec fourccs, video dimensions, languages, mdat payload size — and the
  * exact structural walk any full demuxer must run first.
  *
  * Scope is deliberate and explicit, mirroring [[MpegFrames]]: this
  * operator decodes the CONTAINER, not the samples. Frame/sample
  * reconstruction (stts/stsz/stco sample tables driving codec payloads in
  * mdat) requires the per-codec bitstream decoders (H.264/HEVC/AAC...),
  * which this library does not fabricate; payloads whose samples it cannot
  * reconstruct surface as EXPLICIT NULLS from the decode operators, with
  * this prober still supplying the real container metadata. Everything
  * parsed here is pure spec arithmetic over the public box layouts —
  * sizes, versioned fullbox fields, 16.16 fixed-point dimensions, the
  * 3x5-bit packed language code — with no tabulated signal data.
  *
  * Hostile-byte posture: [[probe]] never throws. Truncated boxes, sizes
  * under the header length, children that do not exactly tile their
  * container, reserved versions, a missing/misplaced ftyp, or a malformed
  * stsd entry list all yield None.
  */
object Mp4Boxes {

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** One parsed box: type + payload bounds (header excluded). */
  final case class Box(typ: String, start: Int, end: Int) {
    def len: Int = end - start
  }

  /** Child boxes exactly tiling [from, to). Handles the three size forms
    * of the spec: plain 32-bit, size==1 -> 64-bit largesize, size==0 ->
    * extends to the end of the enclosing space (top level only). None on
    * any overrun, undersized box, or trailing garbage.
    */
  private[graft] def walk(b: Array[Byte], from: Int, to: Int,
      topLevel: Boolean): Option[Vector[Box]] = {
    val out = Vector.newBuilder[Box]
    var p = from
    while (p < to) {
      if (p + 8 > to) return None
      var size = be32(b, p)
      var hdr = 8
      if (size == 1L) {
        if (p + 16 > to) return None
        size = be64(b, p + 8)
        hdr = 16
        if (size < 0) return None // u64 beyond Long range: not addressable
      } else if (size == 0L) {
        if (!topLevel) return None // to-end form is a top-level-only escape
        size = (to - p).toLong
      }
      if (size < hdr || size > (to - p).toLong) return None
      out += Box(fourcc(b, p + 4), p + hdr, p + size.toInt)
      p += size.toInt
    }
    Some(out.result())
  }

  /** FullBox header: (version, body offset past version+flags), or None
    * when the 4 header bytes do not fit or the version is not 0/1.
    */
  private def fullVer(b: Array[Byte], box: Box): Option[Int] = {
    if (box.len < 4) return None
    val v = b(box.start) & 0xff
    if (v > 1) None else Some(v)
  }

  /** SAMPLE-TABLE summary (stts/stsz/stco, optional ctts) — the
    * per-sample TIMING and SIZE bookkeeping, which is still container
    * metadata: how many samples, how long they last, how many bytes they
    * occupy, in how many chunks — without touching one byte of sample
    * DATA. When both stts and stsz are present their sample counts must
    * agree (spec invariant; a mismatch rejects the probe), and a ctts
    * composition-offset table must cover exactly the stts sample count.
    * `ctts` summarizes the decode-to-presentation reordering: entry
    * count, the largest offset, and the exact sum of per-sample offsets
    * (signed in the version-1 form B-frames need).
    */
  final case class SampleTables(sampleCount: Long, sttsDuration: Long,
      totalSampleBytes: Long, uniformSize: Option[Long], chunkCount: Long,
      ctts: Option[CttsSummary] = None, chunkOffsetSum: Long = 0L,
      co64: Boolean = false, sync: Option[SyncSummary] = None,
      stsc: Option[StscSummary] = None)

  /** ctts summary: run-length entry count, max per-sample composition
    * offset, and the sum of offsets over all samples (exact, signed).
    */
  final case class CttsSummary(entryCount: Long, maxOffset: Long,
      sumOffsets: Long)

  /** stss (sync-sample) summary: how many keyframes, where the first
    * and last sit, and the largest spacing between consecutive ones —
    * the keyframe-interval statistic a video pipeline splits GOPs by.
    * An absent stss means every sample is sync (spec default) and is
    * surfaced as None, not as a fabricated all-samples table.
    */
  final case class SyncSummary(count: Long, first: Long, last: Long,
      maxGap: Long)

  /** stsc (sample-to-chunk) summary: run-length entry count, the
    * largest samples-per-chunk value, and the total sample count the
    * runs IMPLY over the chunk table — which must equal the stts
    * sample count (enforced; the strongest cross-table invariant in
    * the stbl).
    */
  final case class StscSummary(entryCount: Long, maxPerChunk: Long,
      impliedSamples: Long)

  /** One elst edit: `segmentDuration` ticks in the MOVIE timescale,
    * `mediaTime` in the MEDIA timescale (-1 = empty edit: nothing is
    * presented for the segment), and the 16.16 media rate split into its
    * integer and fraction halves.
    */
  final case class Edit(segmentDuration: Long, mediaTime: Long,
      rateInt: Int, rateFrac: Int)

  /** One movie fragment (moof) summary: sequence number, the traf's
    * track, its decode-time anchor (tfdt), and the trun accounting —
    * sample count, total duration, and total declared bytes, with trex
    * defaults resolved per the tfhd/trun flag rules.
    */
  final case class Fragment(sequence: Long, trackId: Long,
      baseDecodeTime: Long, sampleCount: Long, duration: Long,
      sampleBytes: Long)

  /** Per-track container metadata. `width`/`height` are the integer part
    * of tkhd's 16.16 fixed-point values (0 for sound tracks); `lang` is
    * the mdhd 3x5-bit packed code decoded to its 3 lowercase letters;
    * `samples` summarizes the stbl sample tables when present.
    */
  final case class Mp4Track(trackId: Long, handler: String,
      codecs: Vector[String], width: Int, height: Int,
      timescale: Long, duration: Long, lang: String,
      samples: Option[SampleTables] = None,
      edits: Vector[Edit] = Vector.empty) {
    /** Floor-integer track duration in ms — exact cross-engine math. */
    def durationMs: Long =
      if (timescale > 0) duration * 1000L / timescale else 0L
    /** Presentation delay: an INITIAL empty edit's span (movie ticks). */
    def initialDelay: Long =
      edits.headOption.filter(_.mediaTime == -1L)
        .map(_.segmentDuration).getOrElse(0L)
    /** Start trim: the first presented edit's media_time (media ticks). */
    def startTrim: Long =
      edits.find(_.mediaTime >= 0).map(_.mediaTime).getOrElse(0L)
    /** Total edited presentation span in movie ticks. */
    def editDuration: Long = edits.map(_.segmentDuration).sum
  }

  /** Parsed container: ftyp brands, mvhd movie clock, tracks, the total
    * mdat payload size (content deliberately untouched), and — for
    * fragmented (CMAF/DASH-style) files — the moof fragment summaries.
    */
  final case class Mp4Info(brand: String, minorVersion: Long,
      compatibleBrands: Vector[String], timescale: Long, duration: Long,
      tracks: Vector[Mp4Track], mdatBytes: Long,
      fragments: Vector[Fragment] = Vector.empty) {
    def nTracks: Int = tracks.length
    def durationMs: Long =
      if (timescale > 0) duration * 1000L / timescale else 0L
    def fragmented: Boolean = fragments.nonEmpty
  }

  /** Walk a whole file: ftyp must come first (14496-12 §4.3: "should be
    * placed as early as possible"; this prober requires it first, the
    * position every mainstream muxer writes), exactly one moov, any number
    * of mdat/free/skip/unknown boxes (skipped structurally — their sizes
    * still validate). None on any malformation; never throws.
    */
  def probe(b: Array[Byte]): Option[Mp4Info] = {
    val tops = walk(b, 0, b.length, topLevel = true).getOrElse(return None)
    if (tops.isEmpty || tops.head.typ != "ftyp") return None
    val ft = tops.head
    if (ft.len < 8 || (ft.len - 8) % 4 != 0) return None
    val brand = fourcc(b, ft.start)
    val minor = be32(b, ft.start + 4)
    val compat = (0 until (ft.len - 8) / 4)
      .map(i => fourcc(b, ft.start + 8 + 4 * i)).toVector
    val moovs = tops.filter(_.typ == "moov")
    if (moovs.size != 1) return None
    val mdatBytes = tops.filter(_.typ == "mdat").map(_.len.toLong).sum
    val kids = walk(b, moovs.head.start, moovs.head.end, topLevel = false)
      .getOrElse(return None)
    val mvhd = kids.find(_.typ == "mvhd").getOrElse(return None)
    val (ts, dur) = fullVer(b, mvhd).getOrElse(return None) match {
      case 0 if mvhd.len >= 100 => (be32(b, mvhd.start + 12), be32(b, mvhd.start + 16))
      case 1 if mvhd.len >= 112 => (be32(b, mvhd.start + 20), be64(b, mvhd.start + 24))
      case _ => return None
    }
    val trackBoxes = kids.filter(_.typ == "trak")
    val tracks = Vector.newBuilder[Mp4Track]
    trackBoxes.foreach { tk =>
      tracks += parseTrak(b, tk).getOrElse(return None)
    }
    // movie-extends defaults (trex): per-track default sample duration and
    // size, resolved into trun accounting when a fragment omits them
    val trex: Map[Long, (Long, Long)] = kids.find(_.typ == "mvex") match {
      case None => Map.empty
      case Some(mvex) =>
        val trexes = walk(b, mvex.start, mvex.end, topLevel = false)
          .getOrElse(return None).filter(_.typ == "trex")
        trexes.map { t =>
          if (fullVer(b, t).getOrElse(return None) != 0 || t.len < 24) return None
          be32(b, t.start + 4) -> (be32(b, t.start + 12), be32(b, t.start + 16))
        }.toMap
    }
    val frags = Vector.newBuilder[Fragment]
    tops.filter(_.typ == "moof").foreach { mf =>
      frags += parseMoof(b, mf, trex).getOrElse(return None)
    }
    Some(Mp4Info(brand, minor, compat, ts, dur, tracks.result(), mdatBytes,
      frags.result()))
  }

  /** One moof: exactly one mfhd + exactly one traf (the shape CMAF
    * single-track segments use); the traf carries tfhd (track + optional
    * per-fragment defaults), an optional tfdt decode-time anchor, and one
    * or more truns whose per-sample duration/size fields — when absent —
    * fall back to the tfhd defaults, then to the trex defaults.
    */
  private def parseMoof(b: Array[Byte], moof: Box,
      trex: Map[Long, (Long, Long)]): Option[Fragment] = {
    val kids = walk(b, moof.start, moof.end, topLevel = false).getOrElse(return None)
    val mfhds = kids.filter(_.typ == "mfhd")
    val trafs = kids.filter(_.typ == "traf")
    if (mfhds.size != 1 || trafs.size != 1) return None
    val mfhd = mfhds.head
    if (fullVer(b, mfhd).getOrElse(return None) != 0 || mfhd.len < 8) return None
    val seq = be32(b, mfhd.start + 4)
    val traf = trafs.head
    val tkids = walk(b, traf.start, traf.end, topLevel = false).getOrElse(return None)
    val tfhd = tkids.find(_.typ == "tfhd").getOrElse(return None)
    if (tfhd.len < 8) return None
    val tfFlags = (be32(b, tfhd.start) & 0xffffff).toInt
    if ((b(tfhd.start) & 0xff) != 0) return None // tfhd is version 0
    val trackId = be32(b, tfhd.start + 4)
    // optional tfhd fields, in spec order
    var p = tfhd.start + 8
    def take(n: Int): Option[Int] =
      if (p + n <= tfhd.end) { val o = p; p += n; Some(o) } else None
    if ((tfFlags & 0x01) != 0 && take(8).isEmpty) return None // base-data-offset
    if ((tfFlags & 0x02) != 0 && take(4).isEmpty) return None // sample-desc-index
    val defDur: Option[Long] =
      if ((tfFlags & 0x08) != 0) Some(be32(b, take(4).getOrElse(return None)))
      else None
    val defSize: Option[Long] =
      if ((tfFlags & 0x10) != 0) Some(be32(b, take(4).getOrElse(return None)))
      else None
    if ((tfFlags & 0x20) != 0 && take(4).isEmpty) return None // default-sample-flags
    val (trexDur, trexSize) = trex.getOrElse(trackId, (0L, 0L))
    val fallDur = defDur.getOrElse(trexDur)
    val fallSize = defSize.getOrElse(trexSize)
    val tfdt: Long = tkids.find(_.typ == "tfdt") match {
      case None => 0L
      case Some(t) => fullVer(b, t).getOrElse(return None) match {
        case 0 if t.len >= 8 => be32(b, t.start + 4)
        case 1 if t.len >= 12 => be64(b, t.start + 4)
        case _ => return None
      }
    }
    var nSamples = 0L; var sumDur = 0L; var sumBytes = 0L
    val truns = tkids.filter(_.typ == "trun")
    if (truns.isEmpty) return None
    truns.foreach { tr =>
      if (fullVer(b, tr).getOrElse(return None) != 0 || tr.len < 8) return None
      val flags = (be32(b, tr.start) & 0xffffff).toInt
      val count = be32(b, tr.start + 4)
      var q = tr.start + 8
      def rtake(n: Int): Option[Int] =
        if (q + n <= tr.end) { val o = q; q += n; Some(o) } else None
      if ((flags & 0x01) != 0 && rtake(4).isEmpty) return None // data_offset
      if ((flags & 0x04) != 0 && rtake(4).isEmpty) return None // first_sample_flags
      val perDur = (flags & 0x100) != 0
      val perSize = (flags & 0x200) != 0
      val perFlags = (flags & 0x400) != 0
      val perCto = (flags & 0x800) != 0
      var i = 0L
      while (i < count) {
        if (perDur) sumDur += be32(b, rtake(4).getOrElse(return None))
        else sumDur += fallDur
        if (perSize) sumBytes += be32(b, rtake(4).getOrElse(return None))
        else sumBytes += fallSize
        if (perFlags && rtake(4).isEmpty) return None
        if (perCto && rtake(4).isEmpty) return None
        i += 1
      }
      if (q != tr.end) return None // trailing bytes in the trun
      nSamples += count
    }
    Some(Fragment(seq, trackId, tfdt, nSamples, sumDur, sumBytes))
  }

  private def parseTrak(b: Array[Byte], trak: Box): Option[Mp4Track] = {
    val kids = walk(b, trak.start, trak.end, topLevel = false).getOrElse(return None)
    val tkhd = kids.find(_.typ == "tkhd").getOrElse(return None)
    // tkhd body offsets past the version/flags word: v0 packs 32-bit
    // times (track_ID at +12, width/height 16.16 at +76/+80, body 84);
    // v1 widens the times to 64 bits (track_ID +20, width +88, body 96)
    val (tid, w, h) = fullVer(b, tkhd).getOrElse(return None) match {
      case 0 if tkhd.len >= 84 =>
        (be32(b, tkhd.start + 12),
          (be32(b, tkhd.start + 76) >> 16).toInt, (be32(b, tkhd.start + 80) >> 16).toInt)
      case 1 if tkhd.len >= 96 =>
        (be32(b, tkhd.start + 20),
          (be32(b, tkhd.start + 88) >> 16).toInt, (be32(b, tkhd.start + 92) >> 16).toInt)
      case _ => return None
    }
    // edts/elst: optional, at most one, exactly one elst inside; exact
    // entry tiling; media_time is SIGNED (s32/s64 by version), -1 being
    // the only legal negative (the empty-edit marker)
    val edits: Vector[Edit] = kids.find(_.typ == "edts") match {
      case None => Vector.empty
      case Some(ed) =>
        val ekids = walk(b, ed.start, ed.end, topLevel = false)
          .getOrElse(return None)
        val elsts = ekids.filter(_.typ == "elst")
        if (elsts.size != 1) return None
        val el = elsts.head
        val ver = fullVer(b, el).getOrElse(return None)
        if (el.len < 8) return None
        val nE = be32(b, el.start + 4)
        val entryLen = if (ver == 1) 20 else 12
        if (el.len.toLong != 8 + entryLen * nE) return None
        val out = Vector.newBuilder[Edit]
        var i = 0L
        while (i < nE) {
          val o = el.start + 8 + entryLen * i.toInt
          val (segDur, mt, ro) =
            if (ver == 1) (be64(b, o), be64(b, o + 8), o + 16)
            else (be32(b, o), be32(b, o + 4).toInt.toLong, o + 8)
          if (mt < -1L) return None
          out += Edit(segDur, mt, be16(b, ro).toShort.toInt,
            be16(b, ro + 2).toShort.toInt)
          i += 1
        }
        out.result()
    }
    val mdia = kids.find(_.typ == "mdia").getOrElse(return None)
    val mkids = walk(b, mdia.start, mdia.end, topLevel = false).getOrElse(return None)
    val mdhd = mkids.find(_.typ == "mdhd").getOrElse(return None)
    val (mts, mdur, langCode) = fullVer(b, mdhd).getOrElse(return None) match {
      case 0 if mdhd.len >= 24 =>
        (be32(b, mdhd.start + 12), be32(b, mdhd.start + 16), be16(b, mdhd.start + 20))
      case 1 if mdhd.len >= 36 =>
        (be32(b, mdhd.start + 20), be64(b, mdhd.start + 24), be16(b, mdhd.start + 32))
      case _ => return None
    }
    // 3 x 5-bit letters, each stored minus 0x60 (14496-12 §8.4.2)
    val lang = new String(Array(
      ((langCode >> 10) & 31) + 0x60, ((langCode >> 5) & 31) + 0x60,
      (langCode & 31) + 0x60).map(_.toChar))
    val hdlr = mkids.find(_.typ == "hdlr").getOrElse(return None)
    if (fullVer(b, hdlr).getOrElse(return None) != 0 || hdlr.len < 24) return None
    val handler = fourcc(b, hdlr.start + 8)
    val minf = mkids.find(_.typ == "minf").getOrElse(return None)
    val stbl = walk(b, minf.start, minf.end, topLevel = false)
      .getOrElse(return None).find(_.typ == "stbl").getOrElse(return None)
    val stblKids = walk(b, stbl.start, stbl.end, topLevel = false)
      .getOrElse(return None)
    val stsd = stblKids.find(_.typ == "stsd").getOrElse(return None)
    if (fullVer(b, stsd).getOrElse(return None) != 0 || stsd.len < 8) return None
    val entryCount = be32(b, stsd.start + 4)
    val entries = walk(b, stsd.start + 8, stsd.end, topLevel = false)
      .getOrElse(return None)
    // the declared count must match the boxes present, and every sample
    // entry carries at least the 8-byte SampleEntry fields
    if (entries.size.toLong != entryCount || entries.exists(_.len < 8)) return None
    val tables = parseSampleTables(b, stblKids).getOrElse(return None)
    Some(Mp4Track(tid, handler, entries.map(_.typ), w, h, mts, mdur, lang,
      tables, edits))
  }

  /** stts/stsz/stco summary — Some(None) when the track carries no sample
    * tables (a fragmented-file moov), Some(Some(...)) when all three are
    * present and mutually consistent, None (probe rejection) when they
    * are partial, mistiled, or disagree on the sample count.
    */
  private def parseSampleTables(b: Array[Byte],
      stblKids: Vector[Box]): Option[Option[SampleTables]] = {
    val stts = stblKids.find(_.typ == "stts")
    val stsz = stblKids.find(_.typ == "stsz")
    val stcoBox = stblKids.find(_.typ == "stco")
    val co64Box = stblKids.find(_.typ == "co64")
    if (stts.isEmpty && stsz.isEmpty && stcoBox.isEmpty && co64Box.isEmpty) {
      // offset-dependent tables with no timing table to cover reject
      return if (stblKids.exists(k => k.typ == "ctts" || k.typ == "stss"))
        None
      else Some(None)
    }
    // exactly one chunk-offset form: stco (32-bit) or co64 (64-bit)
    if (stcoBox.nonEmpty && co64Box.nonEmpty) return None
    if (stts.isEmpty || stsz.isEmpty || (stcoBox.isEmpty && co64Box.isEmpty))
      return None
    val t = stts.get
    if (fullVer(b, t).getOrElse(return None) != 0 || t.len < 8) return None
    val nT = be32(b, t.start + 4)
    if (t.len.toLong != 8 + 8 * nT) return None // exact entry tiling
    var sttsCount = 0L; var sttsDur = 0L
    var i = 0L
    while (i < nT) {
      val o = t.start + 8 + 8 * i.toInt
      val c = be32(b, o); val d = be32(b, o + 4)
      sttsCount += c; sttsDur += c * d
      i += 1
    }
    val z = stsz.get
    if (fullVer(b, z).getOrElse(return None) != 0 || z.len < 12) return None
    val uniform = be32(b, z.start + 4)
    val nZ = be32(b, z.start + 8)
    val totalBytes =
      if (uniform != 0) {
        if (z.len != 12) return None
        uniform * nZ
      } else {
        if (z.len.toLong != 12 + 4 * nZ) return None
        var s = 0L; var j = 0L
        while (j < nZ) { s += be32(b, z.start + 12 + 4 * j.toInt); j += 1 }
        s
      }
    if (nZ != sttsCount) return None // timing and size tables must agree
    val c = stcoBox.orElse(co64Box).get
    val isCo64 = co64Box.nonEmpty
    val offW = if (isCo64) 8 else 4
    if (fullVer(b, c).getOrElse(return None) != 0 || c.len < 8) return None
    val nC = be32(b, c.start + 4)
    if (c.len.toLong != 8 + offW * nC) return None
    var offSum = 0L
    var ci = 0L
    while (ci < nC) {
      val o = c.start + 8 + offW * ci.toInt
      offSum += (if (isCo64) be64(b, o) else be32(b, o))
      ci += 1
    }
    // stss: optional; sample numbers 1-based, strictly increasing, and
    // bounded by the stts sample count (absent = every sample is sync)
    val sync: Option[SyncSummary] = stblKids.find(_.typ == "stss") match {
      case None => None
      case Some(ss) =>
        if (fullVer(b, ss).getOrElse(return None) != 0 || ss.len < 8)
          return None
        val nS = be32(b, ss.start + 4)
        if (ss.len.toLong != 8 + 4 * nS) return None
        var prev = 0L
        var maxGap = 0L
        var j = 0L
        while (j < nS) {
          val s = be32(b, ss.start + 8 + 4 * j.toInt)
          if (s <= prev || s > sttsCount) return None
          if (prev > 0 && s - prev > maxGap) maxGap = s - prev
          prev = s
          j += 1
        }
        val first = if (nS == 0) 0L else be32(b, ss.start + 8)
        Some(SyncSummary(nS, first, prev, maxGap))
    }
    // ctts: optional; its run lengths must cover exactly the stts sample
    // count; version 0 offsets are unsigned, version 1 signed (B-frames)
    val ctts: Option[CttsSummary] = stblKids.find(_.typ == "ctts") match {
      case None => None
      case Some(ct) =>
        val ver = fullVer(b, ct).getOrElse(return None)
        if (ct.len < 8) return None
        val nCt = be32(b, ct.start + 4)
        if (ct.len.toLong != 8 + 8 * nCt) return None
        var covered = 0L; var maxOff = Long.MinValue; var sumOff = 0L
        var j = 0L
        while (j < nCt) {
          val o = ct.start + 8 + 8 * j.toInt
          val cnt = be32(b, o)
          val off = if (ver == 1) be32(b, o + 4).toInt.toLong else be32(b, o + 4)
          if (cnt < 1) return None
          covered += cnt; sumOff += cnt * off
          if (off > maxOff) maxOff = off
          j += 1
        }
        if (covered != sttsCount) return None
        Some(CttsSummary(nCt, if (nCt == 0) 0L else maxOff, sumOff))
    }
    // stsc: optional; first_chunk strictly increasing from 1, and the
    // implied sample total over the chunk table must equal sttsCount
    val stsc: Option[StscSummary] = stblKids.find(_.typ == "stsc") match {
      case None => None
      case Some(sc) =>
        if (fullVer(b, sc).getOrElse(return None) != 0 || sc.len < 8)
          return None
        val nE = be32(b, sc.start + 4)
        if (sc.len.toLong != 8 + 12 * nE || nE < 1) return None
        var implied = 0L
        var maxSpc = 0L
        var prevFirst = 0L
        var prevSpc = 0L
        var j = 0L
        while (j < nE) {
          val o = sc.start + 8 + 12 * j.toInt
          val first = be32(b, o)
          val spc = be32(b, o + 4)
          val sdi = be32(b, o + 8)
          if (sdi != 1) return None // one stsd entry in this scope
          if (spc < 1) return None
          if (j == 0) { if (first != 1) return None }
          else {
            if (first <= prevFirst) return None
            implied += (first - prevFirst) * prevSpc
          }
          if (spc > maxSpc) maxSpc = spc
          prevFirst = first
          prevSpc = spc
          j += 1
        }
        if (prevFirst > nC) return None // a run starting past the chunks
        implied += (nC - prevFirst + 1) * prevSpc
        if (implied != sttsCount) return None // cross-table invariant
        Some(StscSummary(nE, maxSpc, implied))
    }
    Some(Some(SampleTables(sttsCount, sttsDur, totalBytes,
      if (uniform != 0) Some(uniform) else None, nC, ctts, offSum,
      isCo64, sync, stsc)))
  }

  /** One keyframe's physical location: 1-based sample number, ABSOLUTE
    * file byte offset, and byte size.
    */
  final case class KeyframeRange(sample: Long, offset: Long, size: Long)

  /** KEYFRAME BYTE-RANGE EXTRACTION — the stss→stsc/stsz/stco walk a
    * video pipeline runs to pull sync samples (GOP heads) out of a file
    * with RANGED reads, never a full decode: for each stss entry, resolve
    * its chunk through the stsc runs, its intra-chunk byte offset through
    * the preceding samples' stsz sizes, and its absolute position through
    * stco/co64 (reference functions.py has no media layer; 14496-12 §8.6.2
    * / §8.7.4-5 are the public spec). Works on the FIRST track whose
    * handler matches (default `vide`).
    *
    * Absent stss = every sample is sync (the spec default) — all samples
    * are returned. Declines (None, never throws) on: probe-level
    * malformations, a matching track without full sample tables, a
    * per-chunk layout without an stsc, or any resolved range escaping the
    * file — extraction must not fabricate bytes.
    */
  def keyframeByteRanges(b: Array[Byte],
      handler: String = "vide"): Option[Vector[KeyframeRange]] = {
    // probe() first: all cross-table invariants (stss bounds, stsc tiling,
    // stsz/stts agreement) are already enforced there — this walk can
    // then read the raw tables without re-validating
    val info = probe(b).getOrElse(return None)
    if (!info.tracks.exists(_.handler == handler)) return None
    val top = walk(b, 0, b.length, topLevel = true).getOrElse(return None)
    val moov = top.find(_.typ == "moov").getOrElse(return None)
    val traks = walk(b, moov.start, moov.end, topLevel = false)
      .getOrElse(return None).filter(_.typ == "trak")
    // locate the first matching trak by handler, structurally
    val stblKids: Vector[Box] = traks.view.flatMap { tk =>
      val kids = walk(b, tk.start, tk.end, topLevel = false).getOrElse(return None)
      for {
        mdia <- kids.find(_.typ == "mdia")
        mkids <- walk(b, mdia.start, mdia.end, topLevel = false)
        hd <- mkids.find(_.typ == "hdlr")
        if fourcc(b, hd.start + 8) == handler
        minf <- mkids.find(_.typ == "minf")
        stbl <- walk(b, minf.start, minf.end, topLevel = false)
          .flatMap(_.find(_.typ == "stbl"))
        sk <- walk(b, stbl.start, stbl.end, topLevel = false)
      } yield sk
    }.headOption.getOrElse(return None)
    def tableOf(typ: String): Option[Box] = stblKids.find(_.typ == typ)
    val z = tableOf("stsz").getOrElse(return None)
    val nSamples = be32(b, z.start + 8)
    if (nSamples <= 0 || nSamples > b.length) return None
    val uniform = be32(b, z.start + 4)
    def sizeOf(idx0: Int): Long =
      if (uniform != 0) uniform else be32(b, z.start + 12 + 4 * idx0)
    val c = tableOf("stco").orElse(tableOf("co64")).getOrElse(return None)
    val isCo64 = c.typ == "co64"
    val nC = be32(b, c.start + 4).toInt
    def chunkOff(k: Int): Long =
      if (isCo64) be64(b, c.start + 8 + 8 * k) else be32(b, c.start + 8 + 4 * k)
    // expand stsc runs to each chunk's first 0-based sample index
    val sc = tableOf("stsc").getOrElse(return None)
    val nE = be32(b, sc.start + 4).toInt
    val firstSampleOfChunk = new Array[Long](nC + 1)
    var e = 0
    var sampleAcc = 0L
    var chunkIdx = 1L // 1-based, per the wire format
    while (chunkIdx <= nC) {
      val next: Long =
        if (e + 1 < nE) be32(b, sc.start + 8 + 12 * (e + 1))
        else nC + 1L
      val spc = be32(b, sc.start + 8 + 12 * e + 4)
      while (chunkIdx < next && chunkIdx <= nC) {
        firstSampleOfChunk(chunkIdx.toInt - 1) = sampleAcc
        sampleAcc += spc
        chunkIdx += 1
      }
      e += 1
    }
    firstSampleOfChunk(nC) = sampleAcc
    // sync sample numbers: the stss list, or 1..n when absent
    val syncs: Vector[Long] = tableOf("stss") match {
      case Some(ss) =>
        val nS = be32(b, ss.start + 4).toInt
        (0 until nS).map(j => be32(b, ss.start + 8 + 4 * j)).toVector
      case None => (1L to nSamples).toVector
    }
    val out = Vector.newBuilder[KeyframeRange]
    syncs.foreach { s =>
      val idx0 = s - 1 // 0-based sample index
      // chunk = the last chunk whose first sample is <= idx0
      var k = java.util.Arrays.binarySearch(firstSampleOfChunk, idx0)
      if (k < 0) k = -k - 2
      else {
        // equal keys: binarySearch may land on any; take the LAST chunk
        // starting at idx0 (empty chunks collapse forward)
        while (k + 1 <= nC && firstSampleOfChunk(k + 1) == idx0) k += 1
      }
      if (k < 0 || k >= nC) return None
      var off = chunkOff(k)
      var j = firstSampleOfChunk(k)
      while (j < idx0) { off += sizeOf(j.toInt); j += 1 }
      val sz = sizeOf(idx0.toInt)
      if (off < 0 || sz < 0 || off > b.length.toLong - sz) return None
      out += KeyframeRange(s, off, sz)
    }
    Some(out.result())
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format, minimal but valid.
  // ------------------------------------------------------------------

  /** Track parameters for [[synthMp4]]. `sttsEntries` (count, delta)
    * run-lengths switch the sample tables on: stts from the entries, stsz
    * uniform (`Left(size)`) or per-sample (`Right(sizes)`, length = total
    * count), stco with `chunks` deterministic offsets. `edits` emits an
    * edts/elst (segment_duration, media_time, rate_integer; fraction 0);
    * `cttsRuns` (count, offset) emits a ctts, in the signed version-1
    * form when any offset is negative.
    */
  final case class SynthTrack(trackId: Long, handler: String, codec: String,
      width: Int, height: Int, timescale: Long, duration: Long, lang: String,
      sttsEntries: Seq[(Long, Long)] = Nil,
      sizes: Option[Either[Long, Seq[Long]]] = None,
      chunks: Int = 0,
      edits: Seq[(Long, Long, Int)] = Nil,
      cttsRuns: Seq[(Long, Long)] = Nil,
      useCo64: Boolean = false,
      syncSamples: Seq[Long] = Nil,
      stscRuns: Seq[(Long, Long)] = Nil,
      // chunk offsets RELATIVE TO THE MDAT PAYLOAD (length must equal
      // `chunks`): the synthesizer resolves them to absolute file offsets
      // so stco/co64 point at REAL sample bytes — the precondition for
      // keyframe byte-range extraction ([[keyframeByteRanges]]). None
      // keeps the legacy deterministic placeholder offsets.
      chunkOffsetsRelMdat: Option[Seq[Long]] = None)

  /** One synthetic movie fragment for [[synthFragmented]]: per-sample
    * duration/size lists when present (trun flags 0x100/0x200), otherwise
    * the tfhd per-fragment defaults when present (flags 0x08/0x10),
    * otherwise the trex movie defaults.
    */
  final case class SynthFrag(sequence: Long, baseDecodeTime: Long,
      count: Int, durations: Option[Seq[Long]], sizes: Option[Seq[Long]],
      tfhdDefaults: Option[(Long, Long)], mdatLen: Int)

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
  private def cc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("ISO-8859-1")
  }

  private def boxOf(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    u32(8L + body.length) ++ cc(typ) ++ body
  }
  private def fullBox(typ: String, version: Int, parts: Array[Byte]*): Array[Byte] =
    boxOf(typ, Array(version.toByte, 0.toByte, 0.toByte, 0.toByte) +: parts: _*)

  private def packLang(lang: String): Int = {
    require(lang.length == 3 && lang.forall(c => c >= 'a' && c <= 'z'),
      s"language must be 3 lowercase letters: '$lang'")
    ((lang(0) - 0x60) << 10) | ((lang(1) - 0x60) << 5) | (lang(2) - 0x60)
  }

  /** Synthesize a VALID minimal ISO-BMFF file: ftyp, moov(mvhd + one trak
    * per [[SynthTrack]] with tkhd/mdia(mdhd+hdlr+minf(stbl(stsd with one
    * SampleEntry)))), and an mdat of `mdatLen` deterministic filler bytes.
    * `version1` emits the 64-bit (version 1) forms of mvhd/tkhd/mdhd.
    * Every header is the real wire format — [[probe]] is not told anything
    * the bytes don't say.
    */
  def synthMp4(brand: String, minorVersion: Long, compat: Seq[String],
      timescale: Long, duration: Long, tracks: Seq[SynthTrack],
      mdatLen: Int, fill: Int => Int, version1: Boolean = false): Array[Byte] = {
    val ver = if (version1) 1 else 0
    def time(v: Long): Array[Byte] = if (version1) u64(v) else u32(v)
    val ftyp = boxOf("ftyp",
      (cc(brand) +: u32(minorVersion) +: compat.map(cc)): _*)
    val mvhd = fullBox("mvhd", ver,
      time(0), time(0), // creation, modification
      u32(timescale), time(duration),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0), // rate, volume, reserved
      // unity matrix
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L),
      u32(0), u32(0), u32(0), u32(0), u32(0), u32(0), // pre_defined x6
      u32(0xffffffffL)) // next_track_ID
    def traksFor(mdatBase: Long) = tracks.map { t =>
      val tkhd = fullBox("tkhd", ver,
        time(0), time(0), u32(t.trackId), u32(0), time(t.duration),
        u32(0), u32(0), // reserved
        u16(0), u16(0), u16(if (t.handler == "soun") 0x0100 else 0), u16(0),
        u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
        u32(0), u32(0), u32(0x40000000L),
        u32(t.width.toLong << 16), u32(t.height.toLong << 16))
      val mdhd = fullBox("mdhd", ver,
        time(0), time(0), u32(t.timescale), time(t.duration),
        u16(packLang(t.lang)), u16(0))
      val hdlr = fullBox("hdlr", 0,
        u32(0), cc(t.handler), u32(0), u32(0), u32(0),
        Array(0.toByte)) // empty null-terminated name
      // minimal SampleEntry: 6 reserved bytes + data_reference_index
      val entry = boxOf(t.codec,
        Array.fill(6)(0.toByte), u16(1))
      val stsd = fullBox("stsd", 0, u32(1), entry)
      val tableBoxes: Seq[Array[Byte]] =
        if (t.sttsEntries.isEmpty) Nil
        else {
          val total = t.sttsEntries.map(_._1).sum
          val stts = fullBox("stts", 0,
            (u32(t.sttsEntries.size.toLong) +:
              t.sttsEntries.flatMap { case (c, d) => Seq(u32(c), u32(d)) }): _*)
          val stsz = t.sizes.getOrElse(Left(0L)) match {
            case Left(uniformSz) =>
              require(uniformSz > 0, "uniform sample size must be positive")
              fullBox("stsz", 0, u32(uniformSz), u32(total))
            case Right(szs) =>
              require(szs.size.toLong == total,
                s"stsz needs $total per-sample sizes, got ${szs.size}")
              fullBox("stsz", 0,
                (u32(0L) +: u32(total) +: szs.map(u32)): _*)
          }
          // explicit offsets resolve relative to the mdat payload (so the
          // table points at REAL bytes); legacy placeholder offsets keep
          // the co64 values above 2^32 so a 32-bit misread is caught
          val offAt: Int => Long = t.chunkOffsetsRelMdat match {
            case Some(os) =>
              require(os.size == t.chunks,
                s"chunkOffsetsRelMdat needs ${t.chunks} offsets, got ${os.size}")
              i => mdatBase + os(i)
            case None =>
              if (t.useCo64) i => (5L << 32) + 1000L + 16L * i
              else i => 1000L + 16L * i
          }
          val chunkBox =
            if (t.useCo64)
              fullBox("co64", 0,
                (u32(t.chunks.toLong) +:
                  (0 until t.chunks).map(i => u64(offAt(i)))): _*)
            else
              fullBox("stco", 0,
                (u32(t.chunks.toLong) +:
                  (0 until t.chunks).map(i => u32(offAt(i)))): _*)
          val stssBox: Seq[Array[Byte]] =
            if (t.syncSamples.isEmpty) Nil
            else Seq(fullBox("stss", 0,
              (u32(t.syncSamples.size.toLong) +:
                t.syncSamples.map(u32)): _*))
          val stscBox: Seq[Array[Byte]] =
            if (t.stscRuns.isEmpty) Nil
            else Seq(fullBox("stsc", 0,
              (u32(t.stscRuns.size.toLong) +:
                t.stscRuns.flatMap { case (first, spc) =>
                  Seq(u32(first), u32(spc), u32(1L))
                }): _*))
          Seq(stts, stsz, chunkBox) ++ stssBox ++ stscBox
        }
      val cttsBox: Seq[Array[Byte]] =
        if (t.cttsRuns.isEmpty) Nil
        else {
          require(t.sttsEntries.nonEmpty, "ctts needs an stts to cover")
          require(t.cttsRuns.map(_._1).sum == t.sttsEntries.map(_._1).sum,
            "ctts runs must cover exactly the stts sample count")
          val cttsVer = if (t.cttsRuns.exists(_._2 < 0)) 1 else 0
          Seq(fullBox("ctts", cttsVer,
            (u32(t.cttsRuns.size.toLong) +:
              t.cttsRuns.flatMap { case (c, o) =>
                Seq(u32(c), u32(o & 0xffffffffL))
              }): _*))
        }
      val stbl = boxOf("stbl", (stsd +: (tableBoxes ++ cttsBox)): _*)
      val minf = boxOf("minf", stbl)
      val mdia = boxOf("mdia", mdhd, hdlr, minf)
      val edtsBox: Seq[Array[Byte]] =
        if (t.edits.isEmpty) Nil
        else {
          val elst = fullBox("elst", ver,
            (u32(t.edits.size.toLong) +: t.edits.flatMap {
              case (segDur, mediaTime, rateInt) =>
                require(mediaTime >= -1L, "media_time below -1 is malformed")
                if (version1) Seq(u64(segDur), u64(mediaTime),
                  u16(rateInt), u16(0))
                else Seq(u32(segDur), u32(mediaTime & 0xffffffffL),
                  u16(rateInt), u16(0))
            }): _*)
          Seq(boxOf("edts", elst))
        }
      boxOf("trak", (tkhd +: (edtsBox :+ mdia)): _*)
    }
    // Resolving relative chunk offsets needs the mdat payload's absolute
    // position = |ftyp| + |moov| + 8, and |moov| does not depend on the
    // offset VALUES (fixed-width fields) — so build once at base 0 to
    // measure, then rebuild at the real base.
    val moov =
      if (tracks.forall(_.chunkOffsetsRelMdat.isEmpty)) traksToMoov(mvhd, traksFor(0L))
      else {
        val probe = traksToMoov(mvhd, traksFor(0L))
        traksToMoov(mvhd, traksFor(ftyp.length.toLong + probe.length.toLong + 8L))
      }
    val mdat = boxOf("mdat",
      Array.tabulate(mdatLen)(i => (fill(i) & 0xff).toByte))
    ftyp ++ moov ++ mdat
  }

  private def traksToMoov(mvhd: Array[Byte],
      traks: Seq[Array[Byte]]): Array[Byte] =
    boxOf("moov", (mvhd +: traks): _*)

  /** Synthesize a VALID fragmented (CMAF-style) file: ftyp, moov(mvhd +
    * one trak + mvex(trex with the movie-default sample duration/size)),
    * then per fragment moof(mfhd + traf(tfhd[+defaults] + tfdt v1 +
    * trun[+per-sample fields])) + mdat. tfhd uses default-base-is-moof
    * (0x20000); per-sample duration/size lists set trun flags 0x100/0x200,
    * per-fragment defaults set tfhd flags 0x08/0x10 — the three fallback
    * levels [[probe]] must resolve. Real wire format throughout.
    */
  def synthFragmented(brand: String, minorVersion: Long, compat: Seq[String],
      timescale: Long, duration: Long, track: SynthTrack,
      trexDefaults: (Long, Long), frags: Seq[SynthFrag],
      fill: Int => Int): Array[Byte] = {
    require(track.sttsEntries.isEmpty, "fragmented tracks carry no stbl tables")
    val base = synthMp4(brand, minorVersion, compat, timescale, duration,
      Seq(track), mdatLen = 0, fill, version1 = false)
    // splice mvex into the moov: rebuild rather than patch — simplest is
    // to rebuild moov from scratch with the same parts plus mvex
    val ftypLen = 16 + 4 * compat.size
    val moovStart = ftypLen
    val moovLen = (base.length - ftypLen) - 8 // minus the empty mdat box
    val moovBody = base.slice(moovStart + 8, moovStart + moovLen)
    val trex = fullBox("trex", 0,
      u32(track.trackId), u32(1), // track, default sample description idx
      u32(trexDefaults._1), u32(trexDefaults._2), u32(0))
    val mvex = boxOf("mvex", trex)
    val moov = boxOf("moov", moovBody, mvex)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, ftypLen)
    out.write(moov, 0, moov.length)
    frags.foreach { f =>
      f.durations.foreach(d => require(d.size == f.count, "durations length"))
      f.sizes.foreach(sz => require(sz.size == f.count, "sizes length"))
      val mfhd = fullBox("mfhd", 0, u32(f.sequence))
      val tfFlags = 0x20000 |
        (if (f.tfhdDefaults.isDefined) 0x08 | 0x10 else 0)
      val tfhdParts = Seq(u32(track.trackId)) ++
        f.tfhdDefaults.toSeq.flatMap { case (d, s) => Seq(u32(d), u32(s)) }
      val tfhd = boxOf("tfhd",
        (Array(0.toByte, ((tfFlags >> 16) & 0xff).toByte,
          ((tfFlags >> 8) & 0xff).toByte, (tfFlags & 0xff).toByte) +:
          tfhdParts): _*)
      val tfdt = boxOf("tfdt",
        Array(1.toByte, 0.toByte, 0.toByte, 0.toByte), u64(f.baseDecodeTime))
      val trFlags = (if (f.durations.isDefined) 0x100 else 0) |
        (if (f.sizes.isDefined) 0x200 else 0)
      val samples = (0 until f.count).flatMap { i =>
        f.durations.toSeq.map(d => u32(d(i))) ++
          f.sizes.toSeq.map(sz => u32(sz(i)))
      }
      val trun = boxOf("trun",
        (Array(0.toByte, ((trFlags >> 16) & 0xff).toByte,
          ((trFlags >> 8) & 0xff).toByte, (trFlags & 0xff).toByte) +:
          u32(f.count.toLong) +: samples): _*)
      val traf = boxOf("traf", tfhd, tfdt, trun)
      val moof = boxOf("moof", mfhd, traf)
      val mdat = boxOf("mdat",
        Array.tabulate(f.mdatLen)(i => (fill(i) & 0xff).toByte))
      out.write(moof, 0, moof.length)
      out.write(mdat, 0, mdat.length)
    }
    out.toByteArray
  }
}
