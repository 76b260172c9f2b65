package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 surface: ISO-BMFF/MP4 container probing — the video analogue
  * of the MPEG audio frame walk (q218/q221 protocol: synthesize real wire
  * bytes deterministically per document, probe them with the real parser,
  * oracle-reproduce every number from the public spec arithmetic in
  * closed form).
  */
object Round10Queries {

  /** ISO-BMFF/MP4 CONTAINER PROBE under the oracle gate — per document,
    * synthesize a VALID minimal MP4 (ftyp with brand/minor/compatible
    * brands, moov with versioned mvhd and 1-3 trak subtrees each carrying
    * tkhd 16.16 dimensions, mdhd timescale/duration/packed language,
    * hdlr, and an stsd sample entry whose fourcc is the codec, plus an
    * mdat payload), then REALLY walk it
    * ([[graft.operators.Mp4Boxes.probe]]: size forms, fullbox versions,
    * child tiling, fixed-point and language decodes) and emit the
    * container metadata a media lake's prober extracts from video
    * payloads. Docs with n % 4 == 0 use the 64-bit version-1 box forms,
    * so both layouts sit in the hash. The oracle recomputes every number
    * from the spec layout in closed form — box sizes as integer sums
    * (mvhd 108/120, tkhd 92/104, mdhd 32/44, hdlr 33, stsd chain 88),
    * durations as exact integer division — so a wrong field offset, a
    * version-width slip, or a mis-sized box shifts the walk and lands in
    * the hash. Sample/frame data is EXPLICITLY out of scope (see
    * [[graft.operators.Mp4Boxes]] scaladoc) — the prober supplies
    * container truth, never fabricated samples.
    */
  val q226Mp4Probe: QueryDef = QueryDef(
    "q226_mp4_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.Mp4Boxes
        val v1 = r.n % 4 == 0
        val brand = Seq("isom", "mp42", "avc1", "M4A ")(r.v % 4)
        val nc = 1 + r.n % 3
        val compat = (0 until nc).map(i =>
          Seq("isom", "iso2", "mp41", "avc1")((r.v + i) % 4))
        val ts = 600L * (1 + r.v % 5)
        val dur = r.n.toLong * 1000 + r.v * 17
        val k = 1 + (r.doc_id % 3).toInt
        val tracks = (0 until k).map { t =>
          val video = (r.v + t) % 2 == 0
          Mp4Boxes.SynthTrack(
            trackId = t + 1,
            handler = if (video) "vide" else "soun",
            codec =
              if (video) Seq("avc1", "hvc1", "vp09")((r.n + t) % 3)
              else Seq("mp4a", "ac-3", "Opus")((r.n + t) % 3),
            width = if (video) 16 * (1 + (r.v + t) % 80) else 0,
            height = if (video) 16 * (1 + (r.n + t) % 45) else 0,
            timescale = 1000L * (1 + (r.v + t) % 4),
            duration = r.n.toLong * 800 + t * 333 + r.v,
            lang = new String(Array(
              ('a' + (r.v + t) % 26).toChar,
              ('a' + (r.n + t) % 26).toChar,
              ('a' + (r.v + r.n + t) % 26).toChar)))
        }
        val mdatLen = r.n % 64 + r.v % 16
        val bytes = Mp4Boxes.synthMp4(brand, r.v.toLong, compat, ts, dur,
          tracks, mdatLen, i => i * 31 + r.v, version1 = v1)
        val info = Mp4Boxes.probe(bytes)
          .getOrElse(sys.error(s"synthesized mp4 failed to probe: doc ${r.doc_id}"))
        val nVideo = info.tracks.count(_.handler == "vide")
        (r.doc_id, info.brand, info.minorVersion,
          info.compatibleBrands.mkString(","), info.timescale,
          info.durationMs, info.nTracks, nVideo, info.nTracks - nVideo,
          info.tracks.map(_.codecs.head).mkString(","),
          info.tracks.map(_.width).max, info.tracks.map(_.height).max,
          info.tracks.map(_.durationMs).sum,
          info.tracks.map(_.lang).mkString(","),
          info.mdatBytes, bytes.length.toLong)
      }
      probed.toDF("doc_id", "brand", "minor_version", "compat_str",
          "timescale", "duration_ms", "n_tracks", "n_video", "n_audio",
          "codecs", "max_width", "max_height", "sum_track_ms", "langs",
          "mdat_bytes", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   (n % 4 = 0) AS v1,
                   ['isom', 'mp42', 'avc1', 'M4A '][v % 4 + 1] AS brand,
                   1 + n % 3 AS nc,
                   CAST(600 * (1 + v % 5) AS BIGINT) AS ts,
                   CAST(n AS BIGINT) * 1000 + v * 17 AS dur,
                   CAST(1 + doc_id % 3 AS INTEGER) AS k
            FROM d),
      t AS (SELECT doc_id, n, v, v1, brand, nc, ts, dur, k,
                   list_transform(range(k), t -> (v + t) % 2 = 0) AS isv,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN ['avc1', 'hvc1', 'vp09'][(n + t) % 3 + 1]
                       ELSE ['mp4a', 'ac-3', 'Opus'][(n + t) % 3 + 1] END) AS cods,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN 16 * (1 + (v + t) % 80) ELSE 0 END) AS ws,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN 16 * (1 + (n + t) % 45) ELSE 0 END) AS hs,
                   list_transform(range(k), t ->
                     (CAST(n AS BIGINT) * 800 + t * 333 + v) * 1000
                       // (1000 * (1 + (v + t) % 4))) AS tms,
                   list_transform(range(k), t ->
                     chr(CAST(97 + (v + t) % 26 AS INTEGER)) ||
                     chr(CAST(97 + (n + t) % 26 AS INTEGER)) ||
                     chr(CAST(97 + (v + n + t) % 26 AS INTEGER))) AS lgs
            FROM g)
      SELECT doc_id,
             brand,
             CAST(v AS BIGINT) AS minor_version,
             array_to_string(list_transform(range(nc), i ->
               ['isom', 'iso2', 'mp41', 'avc1'][(v + i) % 4 + 1]), ',') AS compat_str,
             ts AS timescale,
             dur * 1000 // ts AS duration_ms,
             k AS n_tracks,
             CAST(len(list_filter(isv, x -> x)) AS INTEGER) AS n_video,
             CAST(k - len(list_filter(isv, x -> x)) AS INTEGER) AS n_audio,
             array_to_string(cods, ',') AS codecs,
             CAST(list_max(ws) AS INTEGER) AS max_width,
             CAST(list_max(hs) AS INTEGER) AS max_height,
             CAST(list_sum(tms) AS BIGINT) AS sum_track_ms,
             array_to_string(lgs, ',') AS langs,
             CAST(n % 64 + v % 16 AS BIGINT) AS mdat_bytes,
             CAST((16 + 4 * nc)
               + 8 + (CASE WHEN v1 THEN 120 ELSE 108 END)
               + k * (8 + (CASE WHEN v1 THEN 104 ELSE 92 END)
                      + 8 + (CASE WHEN v1 THEN 44 ELSE 32 END) + 33 + 48)
               + 8 + n % 64 + v % 16 AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  private val AdpcmStepsSql: String =
    graft.operators.MediaCodecs.AdpcmStepTable.mkString("[", ", ", "]")

  /** STEREO IMA ADPCM round trip under the oracle gate — q216/q219/q222
    * pin the mono machine; q227 pins the CHANNEL-INTERLEAVED layout: per
    * document, 17 closed-form frames per channel run through the real
    * stereo encoder ([[graft.operators.MediaCodecs.encodeWavAdpcmStereo]]:
    * one 4-byte header per channel per block, coded data in alternating
    * 4-byte nibble groups, two independent predictor/index machines whose
    * state carries across blocks through the headers) and back through
    * the real decoder. blockAlign 16 gives 9 frames/channel/block, so the
    * 17 frames span two blocks with a padded tail the fact chunk
    * truncates — multi-block state carry, interleave, and padding all in
    * the hash. The oracle replays BOTH channels' encode+decode machines
    * in ONE recursive CTE (two state tuples per row; the block-boundary
    * header reset at j = 9 stores the frame verbatim and carries the
    * index, exactly like the wire), so a crossed channel, a swapped
    * group, or a state leak between channels lands in the exact integer
    * comparison.
    */
  val q227AdpcmStereo: QueryDef = QueryDef(
    "q227_adpcm_stereo",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val out = src.map { r =>
        val left = Array.tabulate(17)(j =>
          ((r.v * 53 + j * 409) % 16384 - 8192).toShort)
        val right = Array.tabulate(17)(j =>
          ((r.v * 29 + j * 577) % 16384 - 8192).toShort)
        val wav = graft.operators.MediaCodecs
          .encodeWavAdpcmStereo(22050, left, right, blockAlign = 16)
        val dec = graft.operators.MediaCodecs.decodeWavPcm16(wav)
          .getOrElse(sys.error(s"stereo ADPCM failed to decode: doc ${r.doc_id}"))
        require(dec.channels == 2 && dec.samples.length == 34,
          s"doc ${r.doc_id}: ${dec.channels} ch x ${dec.samples.length}")
        var sumL = 0L; var sumR = 0L; var wL = 0L; var wR = 0L
        var j = 0
        while (j < 17) {
          val l = dec.samples(2 * j).toLong
          val rr = dec.samples(2 * j + 1).toLong
          sumL += l; sumR += rr
          wL += (j + 1) * l; wR += (j + 1) * rr
          j += 1
        }
        (r.doc_id, 17, dec.channels, dec.sampleRate.toLong,
          dec.samples(0).toLong, dec.samples(1).toLong,
          sumL, sumR, wL, wR)
      }
      out.toDF("doc_id", "n_frames", "channels", "sample_rate",
          "first_l", "first_r", "sum_l", "sum_r", "wsum_l", "wsum_r")
        .orderBy("doc_id")
    },
    Some {
      // Textual encode+decode cascade per channel (the q219 macros,
      // instantiated twice with per-channel state and sample formulas);
      // j = 9 is the second block's header: frame stored verbatim, index
      // carried — the wire contract of the per-channel block headers.
      def mac(pred: String, idx: String, sj: String): (String, String) = {
        val step = s"$AdpcmStepsSql[$idx + 1]"
        val d0 = s"abs($sj - $pred)"
        val b4 = s"(CASE WHEN $d0 >= $step THEN 1 ELSE 0 END)"
        val r1 = s"($d0 - $b4 * $step)"
        val b2 = s"(CASE WHEN $r1 >= $step // 2 THEN 1 ELSE 0 END)"
        val r2 = s"($r1 - $b2 * ($step // 2))"
        val b1 = s"(CASE WHEN $r2 >= $step // 4 THEN 1 ELSE 0 END)"
        val mag = s"($step // 8 + $b1 * ($step // 4) + $b2 * ($step // 2) + $b4 * $step)"
        val sgn = s"(CASE WHEN $sj < $pred THEN -1 ELSE 1 END)"
        val predNext = s"CASE WHEN j + 1 = 9 THEN $sj ELSE " +
          s"least(32767, greatest(-32768, $pred + $sgn * $mag)) END"
        val idxNext = s"CASE WHEN j + 1 = 9 THEN $idx ELSE " +
          s"least(88, greatest(0, $idx + " +
          s"[-1, -1, -1, -1, 2, 4, 6, 8][$b4 * 4 + $b2 * 2 + $b1 + 1])) END"
        (predNext, idxNext)
      }
      val sl = "((v * 53 + (j + 1) * 409) % 16384 - 8192)"
      val sr = "((v * 29 + (j + 1) * 577) % 16384 - 8192)"
      val (plN, ilN) = mac("predl", "idxl", sl)
      val (prN, irN) = mac("predr", "idxr", sr)
      s"""
      WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
        FROM documents),
      walk AS (
        SELECT doc_id, v, 0 AS j,
               CAST((v * 53) % 16384 - 8192 AS INTEGER) AS predl, 0 AS idxl,
               CAST((v * 29) % 16384 - 8192 AS INTEGER) AS predr, 0 AS idxr
        FROM d
        UNION ALL
        SELECT doc_id, v, j + 1,
               CAST($plN AS INTEGER), CAST($ilN AS INTEGER),
               CAST($prN AS INTEGER), CAST($irN AS INTEGER)
        FROM walk WHERE j < 16)
      SELECT doc_id,
             17 AS n_frames, 2 AS channels,
             CAST(22050 AS BIGINT) AS sample_rate,
             CAST(min(CASE WHEN j = 0 THEN predl END) AS BIGINT) AS first_l,
             CAST(min(CASE WHEN j = 0 THEN predr END) AS BIGINT) AS first_r,
             CAST(sum(predl) AS BIGINT) AS sum_l,
             CAST(sum(predr) AS BIGINT) AS sum_r,
             CAST(sum((j + 1) * predl) AS BIGINT) AS wsum_l,
             CAST(sum((j + 1) * predr) AS BIGINT) AS wsum_r
      FROM walk GROUP BY doc_id ORDER BY doc_id"""
    })

  /** FRAGMENTED MP4 (CMAF/DASH-style) probe under the oracle gate — the
    * container shape streaming-video lakes actually hold: per document, a
    * synthesized init section (ftyp + moov with mvex/trex movie defaults)
    * followed by 2-4 moof+mdat fragment pairs whose trun sample
    * accounting exercises all THREE default-resolution levels (per-sample
    * duration/size arrays, tfhd per-fragment defaults, trex movie
    * defaults — one fragment per mode by construction), probed by
    * [[graft.operators.Mp4Boxes.probe]] (mfhd sequence, tfhd flag walk,
    * tfdt v1 64-bit decode-time anchor, trun field-presence arithmetic,
    * exact trailing-byte tiling). The oracle recomputes fragment
    * geometry, the three-level fallbacks, and total file size as integer
    * sums over the box layouts, so a flag misread, a skipped optional
    * field, or a fallback taken at the wrong level lands in the hash.
    * Sample DATA stays untouched — mdat is sized, never parsed.
    */
  val q228Mp4Fragments: QueryDef = QueryDef(
    "q228_mp4_fragments",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val out = src.map { r =>
        import graft.operators.Mp4Boxes
        val nc = 1 + r.v % 2
        val brand = Seq("isom", "cmfc", "iso5", "dash")(r.v % 4)
        val compat = (0 until nc).map(i => Seq("iso6", "msdh")((r.v + i) % 2))
        val ts = 1000L * (1 + r.v % 3)
        val dur = r.n.toLong * 100
        val track = Mp4Boxes.SynthTrack(1, "vide",
          Seq("avc1", "hvc1")(r.n % 2),
          width = 16 * (1 + r.v % 80), height = 16 * (1 + r.n % 45),
          timescale = ts, duration = dur,
          lang = new String(Array(('a' + r.v % 26).toChar,
            ('a' + r.n % 26).toChar, ('a' + (r.v + r.n) % 26).toChar)))
        val trexD = (100L + r.v % 50, 500L + r.n % 100)
        val k = 2 + (r.doc_id % 3).toInt
        val frags = (0 until k).map { f =>
          val cnt = 3 + (r.n + f) % 4
          val mode = (r.v + f) % 3
          Mp4Boxes.SynthFrag(
            sequence = f + 1,
            baseDecodeTime = f.toLong * 10000 + r.v,
            count = cnt,
            durations = if (mode == 0)
              Some((0 until cnt).map(i => 90L + (r.v + f * 7 + i * 13) % 30))
            else None,
            sizes = if (mode == 0)
              Some((0 until cnt).map(i => 400L + (r.n + f * 11 + i * 17) % 200))
            else None,
            tfhdDefaults = if (mode == 1)
              Some((120L + (r.v + f) % 40, 600L + (r.n + f) % 80))
            else None,
            mdatLen = 16 + (r.n + f) % 32)
        }
        val bytes = Mp4Boxes.synthFragmented(brand, r.v.toLong, compat, ts,
          dur, track, trexD, frags, i => i * 29 + r.n)
        val info = Mp4Boxes.probe(bytes)
          .getOrElse(sys.error(s"synthesized fMP4 failed to probe: doc ${r.doc_id}"))
        require(info.fragmented && info.fragments.size == k)
        val fs = info.fragments
        (r.doc_id, info.brand, k,
          fs.map(_.sampleCount).sum, fs.map(_.duration).sum,
          fs.map(_.sampleBytes).sum,
          fs.map(_.sequence).sum,
          fs.last.baseDecodeTime + fs.last.duration,
          info.mdatBytes, bytes.length.toLong)
      }
      out.toDF("doc_id", "brand", "n_fragments", "total_samples",
          "sum_duration", "sum_bytes", "seq_sum", "end_time",
          "mdat_total", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   ['isom', 'cmfc', 'iso5', 'dash'][v % 4 + 1] AS brand,
                   1 + v % 2 AS nc,
                   CAST(1 + doc_id % 3 + 1 AS INTEGER) AS k
            FROM d),
      f AS (SELECT doc_id, n, v, brand, nc, k, unnest(range(k)) AS fr
            FROM g),
      fr AS (SELECT doc_id, n, v, brand, nc, k, fr,
                    3 + (n + fr) % 4 AS cnt,
                    (v + fr) % 3 AS mode,
                    CAST(fr * 10000 + v AS BIGINT) AS tfdt
             FROM f),
      acct AS (SELECT doc_id, n, v, brand, nc, k, fr, cnt, mode, tfdt,
                      CASE mode
                        WHEN 0 THEN list_sum(list_transform(range(cnt),
                          i -> 90 + (v + fr * 7 + i * 13) % 30))
                        WHEN 1 THEN cnt * (120 + (v + fr) % 40)
                        ELSE cnt * (100 + v % 50) END AS dur_f,
                      CASE mode
                        WHEN 0 THEN list_sum(list_transform(range(cnt),
                          i -> 400 + (n + fr * 11 + i * 17) % 200))
                        WHEN 1 THEN cnt * (600 + (n + fr) % 80)
                        ELSE cnt * (500 + n % 100) END AS bytes_f,
                      16 + (n + fr) % 32 AS mdat_f,
                      -- moof = 8 + mfhd 16 + traf(8 + tfhd + tfdt 20 + trun)
                      8 + 16 + 8
                        + (CASE WHEN mode = 1 THEN 24 ELSE 16 END)
                        + 20
                        + (16 + CASE WHEN mode = 0 THEN 8 * cnt ELSE 0 END)
                        + 8 + 16 + (n + fr) % 32 AS frag_bytes
               FROM fr)
      SELECT doc_id,
             brand,
             CAST(k AS INTEGER) AS n_fragments,
             CAST(sum(cnt) AS BIGINT) AS total_samples,
             CAST(sum(dur_f) AS BIGINT) AS sum_duration,
             CAST(sum(bytes_f) AS BIGINT) AS sum_bytes,
             CAST(sum(fr + 1) AS BIGINT) AS seq_sum,
             CAST(max(tfdt) + max(CASE WHEN fr = k - 1 THEN dur_f END)
               AS BIGINT) AS end_time,
             CAST(sum(mdat_f) AS BIGINT) AS mdat_total,
             CAST((16 + 4 * nc) + (8 + 108 + 221 + 40) + sum(frag_bytes)
               AS BIGINT) AS file_bytes
      FROM acct GROUP BY doc_id, brand, nc, k ORDER BY doc_id"""))

  /** SAMPLE-TABLE walk (stts/stsz/stco) under the oracle gate — the
    * per-sample TIMING/SIZE bookkeeping of a progressive (non-fragmented)
    * MP4, which is still container metadata: per document, 1-3 tracks
    * whose stts run-lengths, uniform-vs-per-sample stsz, and stco chunk
    * lists are minted closed-form, synthesized as real boxes, and walked
    * by the probe (exact entry tiling, stts-vs-stsz sample-count
    * consistency enforced). mdhd durations deliberately match the stts
    * sum on only half the tracks, so the coherence check itself is
    * data-varying and lands in the hash. Sample DATA stays untouched.
    */
  val q229Mp4SampleTables: QueryDef = QueryDef(
    "q229_mp4_sample_tables",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val out = src.map { r =>
        import graft.operators.Mp4Boxes
        val k = 1 + (r.doc_id % 3).toInt
        val tracks = (0 until k).map { t =>
          val e = 2 + (r.n + t) % 3
          val entries = (0 until e).map(j =>
            (2L + (r.v + t + j) % 5, 100L * (1 + (r.n + t + j) % 4)))
          val total = entries.map(_._1).sum
          val sttsDur = entries.map { case (c, dl) => c * dl }.sum
          val uniform = (r.v + t) % 2 == 0
          val sizes: Either[Long, Seq[Long]] =
            if (uniform) Left(300L + (r.n + t) % 100)
            else Right((0L until total).map(i => 200L + (r.v + i * 19 + t) % 150))
          val mdur = sttsDur + (if ((r.n + t) % 2 == 0) 0L else 7L)
          Mp4Boxes.SynthTrack(t + 1, if (t % 2 == 0) "vide" else "soun",
            if (t % 2 == 0) "avc1" else "mp4a",
            width = if (t % 2 == 0) 320 else 0,
            height = if (t % 2 == 0) 240 else 0,
            timescale = 1000L * (1 + (r.v + t) % 4), duration = mdur,
            lang = "und",
            sttsEntries = entries, sizes = Some(sizes),
            chunks = 1 + (r.n + t) % 4)
        }
        val bytes = Mp4Boxes.synthMp4("isom", r.v.toLong, Seq("mp41"),
          600L, r.n.toLong * 50, tracks, mdatLen = r.n % 50,
          i => i * 37 + r.v)
        val info = Mp4Boxes.probe(bytes)
          .getOrElse(sys.error(s"synthesized sample tables failed: doc ${r.doc_id}"))
        val st = info.tracks.map(t => (t, t.samples.getOrElse(
          sys.error(s"missing tables: doc ${r.doc_id}"))))
        (r.doc_id, k,
          st.map(_._2.sampleCount).sum,
          st.map(_._2.sttsDuration).sum,
          st.map(_._2.totalSampleBytes).sum,
          st.count(_._2.uniformSize.isDefined),
          st.map(_._2.chunkCount).sum,
          st.count { case (t, sa) => t.duration == sa.sttsDuration },
          bytes.length.toLong)
      }
      out.toDF("doc_id", "n_tracks", "total_samples", "sum_stts_dur",
          "sum_bytes", "n_uniform", "chunk_total", "n_dur_match",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, CAST(1 + doc_id % 3 AS INTEGER) AS k
            FROM d),
      tr AS (SELECT doc_id, n, v, k, unnest(range(k)) AS t FROM g),
      per AS (SELECT doc_id, n, v, k, t,
                     2 + (n + t) % 3 AS e,
                     list_sum(list_transform(range(2 + (n + t) % 3),
                       j -> 2 + (v + t + j) % 5)) AS total,
                     list_sum(list_transform(range(2 + (n + t) % 3),
                       j -> (2 + (v + t + j) % 5) * 100 * (1 + (n + t + j) % 4)))
                       AS sttsdur,
                     (v + t) % 2 = 0 AS uni,
                     1 + (n + t) % 4 AS chunks
              FROM tr),
      acct AS (SELECT doc_id, n, v, k, t, e, total, sttsdur, uni, chunks,
                      CASE WHEN uni THEN (300 + (n + t) % 100) * total
                           ELSE list_sum(list_transform(
                             range(CAST(total AS BIGINT)),
                             i -> 200 + (v + i * 19 + t) % 150)) END AS bytes_t,
                      CASE WHEN (n + t) % 2 = 0 THEN 1 ELSE 0 END AS dmatch,
                      -- trak = 8 + tkhd 92 + mdia(8 + mdhd 32 + hdlr 33
                      --   + minf(8 + stbl(8 + stsd 32 + stts + stsz + stco)))
                      8 + 92 + 8 + 32 + 33 + 8 + 8 + 32
                        + (16 + 8 * e)
                        + (CASE WHEN uni THEN 20 ELSE 20 + 4 * total END)
                        + (16 + 4 * chunks) AS trak_bytes
               FROM per)
      SELECT doc_id,
             k AS n_tracks,
             CAST(sum(total) AS BIGINT) AS total_samples,
             CAST(sum(sttsdur) AS BIGINT) AS sum_stts_dur,
             CAST(sum(bytes_t) AS BIGINT) AS sum_bytes,
             CAST(sum(CASE WHEN uni THEN 1 ELSE 0 END) AS INTEGER) AS n_uniform,
             CAST(sum(chunks) AS BIGINT) AS chunk_total,
             CAST(sum(dmatch) AS INTEGER) AS n_dur_match,
             CAST(20 + (8 + 108 + sum(trak_bytes)) + 8 + n % 50
               AS BIGINT) AS file_bytes
      FROM acct GROUP BY doc_id, k, n ORDER BY doc_id"""))

  /** FULL BPE TRAINER under the oracle gate — q139 pinned two merge
    * rounds; q230 runs the real vocabulary-induction loop
    * ([[graft.operators.TextAnalysis.bpeTrain]]): SIX greedy rounds, each
    * a distributed corpus-weighted pair count over the current symbol
    * sequences, a one-row argmax (count desc, pair asc), the leftmost
    * greedy fold merge, and the post-merge corpus token count — the
    * compression trajectory that drives vocabulary-size decisions. The
    * oracle UNROLLS all six rounds textually (the q190 unrolled-CTE
    * protocol): pair counts, argmax, the identical list_reduce fold, and
    * the token count per round, so a tie-break slip, a fold divergence on
    * adjacent repeats, or a stale symbol table in ANY round lands in the
    * hash. Driver state is one scalar row per round — the loop shape is
    * corpus-size-independent.
    */
  val q230BpeTrain: QueryDef = QueryDef(
    "q230_bpe_train",
    (s, dir) => graft.operators.TextAnalysis
      .bpeTrain(Tables.load(s, dir, "documents"), rounds = 6)
      .orderBy("round"),
    Some {
      val K = 6
      def tokCount(i: Int): String =
        s"""n$i AS (SELECT CAST(SUM(cnt * len(string_split(trim(s), ' ')))
           |  AS BIGINT) AS t FROM sym$i)""".stripMargin
      val ctes = (1 to K).map(i =>
        BpeSql.pairs(i) + ",\n" + BpeSql.fold(i) + ",\n" + tokCount(i))
        .mkString(",\n")
      val rows = (1 to K).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS round, p AS pair,
           |  replace(p, ' ', '') AS merged, CAST(pc AS BIGINT) AS pc,
           |  (SELECT t FROM n$i) AS corpus_tokens FROM top$i"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""
      WITH ${BpeSql.words},
      $ctes
      $rows
      ORDER BY round"""
    })

  /** BPE TOKENIZATION at corpus scale — the APPLY side of q230's trainer:
    * learn the six merges, then tokenize every document with them and
    * emit per-doc word and BPE-token counts (the sequence-length budget a
    * packing pipeline feeds on). Shape: the merges fold over the
    * DISTINCT-WORD table only (vocabulary-sized work, the chained
    * [[graft.operators.TextAnalysis.bpeApplyMerge]] folds), and the
    * corpus pass is one explode + equi-join + per-doc aggregate — the
    * expensive fold never touches per-occurrence rows. The oracle
    * re-derives the merges with the q230 unrolled chain and joins its own
    * sym6 table back to the exploded corpus, so a divergence in either
    * the training OR the application lands in the hash.
    */
  val q231BpeTokenize: QueryDef = QueryDef(
    "q231_bpe_tokenize",
    (s, dir) => {
      import graft.operators.TextAnalysis
      val docs = Tables.load(s, dir, "documents")
      val merges = TextAnalysis.bpeTrain(docs, rounds = 6)
        .orderBy("round").collect().map(_.getString(1)) // the pair per round
      TextAnalysis.bpeTokenCounts(docs, merges.toSeq).orderBy("doc_id")
    },
    Some {
      val K = 6
      s"""
      WITH ${BpeSql.words},
      ${BpeSql.chain(K)}
      SELECT d.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(SUM(len(string_split(trim(sym$K.s), ' '))) AS BIGINT)
               AS n_bpe_tokens
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents) d
      JOIN sym$K ON d.w = sym$K.w
      WHERE d.w != ''
      GROUP BY d.doc_id ORDER BY d.doc_id"""
    })

  /** UNIFIED CONTAINER PROBE over a MIXED-FAMILY corpus — the
    * `ffprobe`-shaped front door a media lake runs first: per document the
    * payload is (by doc_id mod 4) a real MP4, a real MPEG-1 audio stream,
    * a real PCM16 WAV, or RAW TEXT, and
    * [[graft.operators.Multimodal.probeContainers]] dispatches the
    * container families in false-positive-safe order, reporting container
    * kind, duration, stream count, and codec — with the text payloads
    * surfacing as EXPLICIT all-null reject rows (the q50 contract at the
    * container level). The oracle recomputes every family's metadata
    * closed-form (mvhd clock division, the MPEG frame-size walk, the WAV
    * sample arithmetic) AND the exact payload byte sizes, so a family
    * misdispatch, a false positive on text, or any probe regression lands
    * in the hash.
    */
  val q232ContainerProbe: QueryDef = QueryDef(
    "q232_container_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"),
          col("text"))
      val media = src.map { r =>
        val docId = r.getLong(0); val n = r.getInt(1); val v = r.getInt(2)
        val text = r.getString(3)
        val payload: Array[Byte] = (docId % 4) match {
          case 0 =>
            graft.operators.Mp4Boxes.synthMp4("isom", v.toLong, Seq("mp41"),
              600L * (1 + v % 5), n.toLong * 1000 + v * 17,
              Seq(graft.operators.Mp4Boxes.SynthTrack(1, "vide", "avc1",
                320, 240, 30000L, 90000L, "und")),
              mdatLen = n % 32, i => i * 11 + v)
          case 1 =>
            graft.operators.MpegFrames.synthStream(1 + v % 3, n % 3,
              (0 until 2 + n % 4).map(j => (1 + (v + j) % 14, (n + j) % 2 == 0)),
              (fi, j) => fi * 7 + j * 13)
          case 2 =>
            graft.operators.MediaCodecs.encodeWavPcm16(8000,
              Array.tabulate(10 + n % 20)(i => ((v * 31 + i * 97) % 8192).toShort))
          case _ => text.getBytes("UTF-8")
        }
        graft.operators.Multimodal.MediaRow(docId, payload,
          graft.operators.Multimodal.MediaMeta("mixed", payload.length, 0L))
      }
      graft.operators.Multimodal.probeContainers(media).toDF()
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      mpeg AS (SELECT doc_id, n, v,
                      CAST(1 + v % 3 AS INTEGER) AS layer,
                      [44100, 48000, 32000][n % 3 + 1] AS sr,
                      2 + n % 4 AS k
               FROM d WHERE doc_id % 4 = 1),
      mpeg2 AS (SELECT doc_id, layer, sr, k,
                       CASE WHEN layer = 1 THEN 384 ELSE 1152 END AS spf,
                       list_sum(list_transform(range(k), j ->
                         CASE WHEN layer = 1
                           THEN (12000 * [[32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
                                 [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
                                 [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
                                ][layer][(v + j) % 14 + 1] // sr
                                 + CASE WHEN (n + j) % 2 = 0 THEN 1 ELSE 0 END) * 4
                           ELSE 144000 * [[32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
                                 [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
                                 [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
                                ][layer][(v + j) % 14 + 1] // sr
                                 + CASE WHEN (n + j) % 2 = 0 THEN 1 ELSE 0 END
                         END)) AS stream_bytes
                FROM mpeg)
      SELECT d.doc_id,
             CASE d.doc_id % 4 WHEN 0 THEN 'mp4' WHEN 1 THEN 'mpeg'
                               WHEN 2 THEN 'wav' END AS container,
             CASE d.doc_id % 4
               WHEN 0 THEN (CAST(d.n AS BIGINT) * 1000 + d.v * 17) * 1000
                             // (600 * (1 + d.v % 5))
               WHEN 1 THEN CAST(m.k AS BIGINT) * m.spf * 1000 // m.sr
               WHEN 2 THEN CAST(10 + d.n % 20 AS BIGINT) * 1000 // 8000
             END AS duration_ms,
             CASE WHEN d.doc_id % 4 <= 2 THEN 1 END AS n_streams,
             CASE d.doc_id % 4 WHEN 0 THEN 'avc1'
                               WHEN 1 THEN 'mp' || CAST(1 + d.v % 3 AS VARCHAR)
                               WHEN 2 THEN 'pcm16' END AS codec,
             CAST(CASE d.doc_id % 4
               WHEN 0 THEN 20 + 8 + 108 + 221 + 8 + d.n % 32
               WHEN 1 THEN m.stream_bytes
               WHEN 2 THEN 44 + 2 * (10 + d.n % 20)
               ELSE d.n
             END AS BIGINT) AS payload_bytes
      FROM d LEFT JOIN mpeg2 m ON d.doc_id = m.doc_id
      ORDER BY d.doc_id"""))

  /** TIFF/IFD container probe under the oracle gate — the remaining major
    * image container (and the DNG/GeoTIFF shape): per document a real
    * multi-page TIFF in a doc-varying byte order
    * ([[graft.operators.TiffProbe.synthTiff]]: II/MM header, chained IFDs,
    * tags sorted ascending per the spec, inline SHORT/LONG values), walked
    * by the real prober (byte-order dispatch, strict IFD tiling, the
    * ascending-tag rule, the next-IFD chain with a cycle guard) and
    * reduced to per-doc page/geometry statistics. Raster strips stay
    * untouched — container truth only. The oracle recomputes every tag
    * value and the exact file size (8 + pages x 78) closed-form.
    */
  val q233TiffProbe: QueryDef = QueryDef(
    "q233_tiff_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val out = src.map { r =>
        import graft.operators.TiffProbe
        val le = r.n % 2 == 0
        val k = 1 + (r.doc_id % 3).toInt
        val pages = (0 until k).map { p =>
          TiffProbe.SynthPage(
            width = 100L + (r.v + p) % 900,
            height = 50L + (r.n + p) % 500,
            bits = Seq(1L, 8L, 16L)((r.v + p) % 3),
            compression = Seq(1L, 5L, 7L)((r.n + p) % 3),
            orientation = 1L + (r.v + p) % 8,
            samplesPerPixel = 1L + (r.n + p) % 3)
        }
        val bytes = TiffProbe.synthTiff(le, pages)
        val info = TiffProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized TIFF failed to probe: doc ${r.doc_id}"))
        require(info.nPages == k && info.littleEndian == le)
        val ps = info.pages
        (r.doc_id, if (info.littleEndian) "II" else "MM", k,
          ps.map(_.width).sum, ps.map(_.height).sum, ps.map(_.bits).sum,
          ps.map(_.orientation).max, ps.map(_.samplesPerPixel).sum,
          ps.count(_.compression != 1L), bytes.length.toLong)
      }
      out.toDF("doc_id", "byte_order", "n_pages", "sum_width", "sum_height",
          "sum_bits", "max_orient", "sum_spp", "n_compressed", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, CAST(1 + doc_id % 3 AS INTEGER) AS k
            FROM d),
      pg AS (SELECT doc_id, n, v, k, unnest(range(k)) AS p FROM g),
      acct AS (SELECT doc_id, n, v, k, p,
                      100 + (v + p) % 900 AS w,
                      50 + (n + p) % 500 AS h,
                      [1, 8, 16][(v + p) % 3 + 1] AS bits,
                      [1, 5, 7][(n + p) % 3 + 1] AS comp,
                      1 + (v + p) % 8 AS orient,
                      1 + (n + p) % 3 AS spp
               FROM pg)
      SELECT doc_id,
             CASE WHEN n % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
             k AS n_pages,
             CAST(sum(w) AS BIGINT) AS sum_width,
             CAST(sum(h) AS BIGINT) AS sum_height,
             CAST(sum(bits) AS BIGINT) AS sum_bits,
             CAST(max(orient) AS BIGINT) AS max_orient,
             CAST(sum(spp) AS BIGINT) AS sum_spp,
             CAST(sum(CASE WHEN comp != 1 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_compressed,
             CAST(8 + k * 78 AS BIGINT) AS file_bytes
      FROM acct GROUP BY doc_id, n, k ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q226Mp4Probe, q227AdpcmStereo, q228Mp4Fragments, q229Mp4SampleTables,
      q230BpeTrain, q231BpeTokenize, q232ContainerProbe, q233TiffProbe)
}
