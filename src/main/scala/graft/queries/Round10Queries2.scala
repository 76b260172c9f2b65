package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 surface, second tranche: ID3v2 tag decoding — the metadata
  * layer of the MP3 story ([[graft.operators.MpegFrames]] measures and
  * skips the tag; [[graft.operators.Id3]] decodes it), under the same
  * q218/q221 protocol: synthesize real wire bytes deterministically per
  * document, parse them with the real parser, oracle-reproduce every
  * number and string from the public spec layout in closed form.
  */
object Round10Queries2 {

  /** ID3v2 TEXT-FRAME DECODE under the oracle gate — per document,
    * synthesize a VALID ID3v2.3 or v2.4 tag (TIT2/TPE1/TALB/TYER-or-TDRC/
    * TRCK text frames in a doc-determined encoding, an occasional PRIV
    * binary frame, zero padding) followed by a VALID multi-frame MPEG-1
    * stream, then REALLY parse both layers: [[graft.operators.Id3.parse]]
    * walks the frames (v2.3 plain-32-bit vs v2.4 syncsafe sizes, the
    * encoding's body layout incl. the UTF-16 BOM) and
    * [[graft.operators.MpegFrames.probe]] must skip the very same tag via
    * its declared syncsafe size and walk the audio frames behind it — the
    * two parsers' accounts of the tag span are cross-checked row by row.
    * The oracle recomputes every string (chr/repeat arithmetic) and every
    * size (frame = 10-byte header + 1 encoding byte + payload, UTF-16
    * payload = BOM + 2 bytes/char, tag = 10 + frames + padding) in closed
    * form, so a size-form slip, a BOM miss, an encoding-width error, or a
    * mis-skipped tag lands in the hash.
    */
  val q234Id3Tags: QueryDef = QueryDef(
    "q234_id3_tags",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.{Id3, MpegFrames}
        val major = if (r.n % 2 == 0) 4 else 3
        val enc =
          if (r.v % 3 == 2) (if (major == 4) 3 else 0) else r.v % 3
        val title = "t" + ('a' + r.v % 26).toChar.toString * (1 + r.n % 8)
        val artist = "a" + ('a' + (r.n + r.v) % 26).toChar.toString +
          ('a' + (2 * r.n + r.v) % 26).toChar.toString
        val album = "b" + ('a' + r.n % 26).toChar.toString * (1 + r.v % 5)
        val yearId = if (major == 4) "TDRC" else "TYER"
        val year = (1960 + r.v % 60).toString
        val track = (1 + r.n % 20).toString
        val bin =
          if (r.v % 4 == 0)
            Seq(("PRIV", Array.tabulate(1 + r.n % 6)(i => ((i * 29 + r.v) % 251).toByte)))
          else Nil
        val tagBytes = Id3.synthTag(major,
          Seq(("TIT2", title, enc), ("TPE1", artist, enc),
            ("TALB", album, enc), (yearId, year, enc), ("TRCK", track, enc)),
          padding = r.n % 33, binFrames = bin)
        val layer = 1 + (r.doc_id % 3).toInt
        val srIdx = r.n % 3
        val k = 2 + r.v % 3
        val frames = (0 until k).map(j => (1 + (r.v + j) % 14, (r.n + j) % 2 == 0))
        val bytes = tagBytes ++ MpegFrames.synthStream(
          layer, srIdx, frames, (fi, j) => (fi * 11 + j * 7) % 251)
        val info = MpegFrames.probe(bytes)
          .getOrElse(sys.error(s"stream failed to probe: doc ${r.doc_id}"))
        val tag = Id3.parse(bytes)
          .getOrElse(sys.error(s"tag failed to parse: doc ${r.doc_id}"))
        // the two parsers must agree on the tag span byte for byte
        require(info.id3v2Bytes == tag.tagBytes,
          s"tag-span disagreement on doc ${r.doc_id}: " +
            s"${info.id3v2Bytes} vs ${tag.tagBytes}")
        (r.doc_id, tag.major, tag.tagBytes.toLong, tag.nFrames,
          tag.frames.head.encoding, tag.text("TIT2").orNull,
          tag.text("TPE1").orNull, tag.text("TALB").orNull,
          tag.text(yearId).orNull, tag.text("TRCK").orNull,
          tag.frames.exists(_.id == "PRIV"), tag.paddingBytes,
          info.nFrames, info.durationMs, bytes.length.toLong)
      }
      probed.toDF("doc_id", "major", "tag_bytes", "n_id3_frames", "enc",
          "title", "artist", "album", "year_txt", "track_txt", "has_priv",
          "padding", "n_mpeg_frames", "duration_ms", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN n % 2 = 0 THEN 4 ELSE 3 END AS major,
                   CASE WHEN v % 3 = 2
                        THEN (CASE WHEN n % 2 = 0 THEN 3 ELSE 0 END)
                        ELSE v % 3 END AS enc,
                   2 + n % 8 AS len_t,
                   3 AS len_a,
                   2 + v % 5 AS len_b,
                   4 AS len_y,
                   CAST(len(CAST(1 + n % 20 AS VARCHAR)) AS INTEGER) AS len_k,
                   CASE WHEN v % 4 = 0 THEN 10 + 1 + n % 6 ELSE 0 END AS priv,
                   n % 33 AS pad,
                   CAST(1 + doc_id % 3 AS INTEGER) AS layer,
                   [44100, 48000, 32000][n % 3 + 1] AS sr,
                   2 + v % 3 AS k
            FROM d),
      t AS (SELECT *,
                   11 + (CASE WHEN enc = 1 THEN 2 + 2 * len_t ELSE len_t END)
                 + 11 + (CASE WHEN enc = 1 THEN 2 + 2 * len_a ELSE len_a END)
                 + 11 + (CASE WHEN enc = 1 THEN 2 + 2 * len_b ELSE len_b END)
                 + 11 + (CASE WHEN enc = 1 THEN 2 + 2 * len_y ELSE len_y END)
                 + 11 + (CASE WHEN enc = 1 THEN 2 + 2 * len_k ELSE len_k END)
                 + priv + pad AS tag_body,
                   CASE WHEN layer = 1 THEN 384 ELSE 1152 END AS spf,
                   list_transform(range(k), j ->
                     [[32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
                      [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
                      [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
                     ][layer][(v + j) % 14 + 1]) AS kbps,
                   list_transform(range(k), j ->
                     CASE WHEN (n + j) % 2 = 0 THEN 1 ELSE 0 END) AS pads
            FROM g)
      SELECT doc_id,
             major,
             CAST(10 + tag_body AS BIGINT) AS tag_bytes,
             CAST(5 + (CASE WHEN v % 4 = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_id3_frames,
             CAST(enc AS INTEGER) AS enc,
             't' || repeat(chr(CAST(97 + v % 26 AS INTEGER)), 1 + n % 8) AS title,
             'a' || chr(CAST(97 + (n + v) % 26 AS INTEGER))
                 || chr(CAST(97 + (2 * n + v) % 26 AS INTEGER)) AS artist,
             'b' || repeat(chr(CAST(97 + n % 26 AS INTEGER)), 1 + v % 5) AS album,
             CAST(1960 + v % 60 AS VARCHAR) AS year_txt,
             CAST(1 + n % 20 AS VARCHAR) AS track_txt,
             v % 4 = 0 AS has_priv,
             CAST(pad AS INTEGER) AS padding,
             CAST(k AS INTEGER) AS n_mpeg_frames,
             CAST(CAST(k AS BIGINT) * spf * 1000 // sr AS BIGINT) AS duration_ms,
             CAST(10 + tag_body + list_sum(list_transform(range(k), j ->
               CASE WHEN layer = 1
                    THEN (12000 * kbps[j + 1] // sr + pads[j + 1]) * 4
                    ELSE 144000 * kbps[j + 1] // sr + pads[j + 1] END))
               AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** MP4 EDIT LISTS + COMPOSITION OFFSETS under the oracle gate — the
    * remaining container-TIMING subtlety after q226/q228/q229: per
    * document, synthesize a VALID MP4 whose single track carries an
    * edts/elst (an initial empty edit on even-n docs — the classic
    * presentation delay — then normal edits with media_time start trims)
    * and a ctts composition-offset table covering exactly the stts sample
    * count (signed version-1 offsets whenever the doc's offset schedule
    * dips negative, as B-frame reordering does; version-0 unsigned
    * otherwise), then REALLY parse it ([[graft.operators.Mp4Boxes.probe]]:
    * exact elst/ctts entry tiling, signed media_time and offset decode,
    * the empty-edit marker, the ctts-covers-stts invariant) and emit the
    * presentation-timing summary. The oracle recomputes every number in
    * closed form — the delay/trim/edit-span decomposition, the signed
    * offset sum (a parser that misreads version-1 offsets as unsigned is
    * off by 2^32 per negative sample), and the full file byte layout with
    * the two new boxes in it.
    */
  val q235Mp4Edits: QueryDef = QueryDef(
    "q235_mp4_edits",
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
        val mts = 600L * (1 + r.v % 4)
        val tts = 1000L * (1 + r.v % 3)
        val nst = 1 + r.n % 3
        val stts = (0 until nst).map(j =>
          (1L + (r.v + j) % 4, 10L + (r.n + j) % 20))
        val sTot = stts.map(_._1).sum.toInt
        val sizes: Either[Long, Seq[Long]] =
          if (r.v % 2 == 0) Left(100L + r.v % 50)
          else Right((0 until sTot).map(i => 50L + (i * 13 + r.n) % 100))
        val ctts = (0 until sTot).map { i =>
          val off =
            if (r.n % 3 == 0) ((r.v + i * 7) % 9).toLong * 5
            else (((r.v + i * 7) % 9).toLong - 3) * 10
          (1L, off)
        }
        val ne = 1 + r.v % 3
        val edits = (0 until ne).map { e =>
          if (r.n % 2 == 0 && e == 0) (300L + r.v % 100, -1L, 1)
          else (200L + (r.n + e * 37) % 300L, (r.v + e * 11) % 500L, 1)
        }
        val track = Mp4Boxes.SynthTrack(
          trackId = 1, handler = "vide", codec = "avc1",
          width = 640, height = 360, timescale = tts,
          duration = r.n.toLong * 700 + r.v, lang = "und",
          sttsEntries = stts, sizes = Some(sizes), chunks = 1 + r.n % 4,
          edits = edits, cttsRuns = ctts)
        val mdatLen = r.n % 40 + r.v % 8
        val bytes = Mp4Boxes.synthMp4("isom", r.v.toLong, Seq("isom"),
          mts, r.n.toLong * 500 + r.v, Seq(track), mdatLen,
          i => i * 17 + r.n, version1 = false)
        val info = Mp4Boxes.probe(bytes)
          .getOrElse(sys.error(s"synthesized mp4 failed to probe: doc ${r.doc_id}"))
        val t = info.tracks.head
        val st = t.samples.getOrElse(sys.error("sample tables missing"))
        val ct = st.ctts.getOrElse(sys.error("ctts missing"))
        (r.doc_id, t.edits.length, t.initialDelay, t.startTrim,
          t.editDuration, t.editDuration * 1000L / info.timescale,
          st.sampleCount, st.sttsDuration, ct.entryCount, ct.maxOffset,
          ct.sumOffsets, st.totalSampleBytes, st.uniformSize.isDefined,
          st.chunkCount, bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_edits", "initial_delay", "start_trim",
          "edit_dur", "edited_ms", "sample_count", "stts_dur",
          "ctts_entries", "ctts_max", "ctts_sum", "sample_bytes",
          "uniform_sz", "chunk_count", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   600 * (1 + v % 4) AS mts,
                   1 + n % 3 AS nst,
                   1 + v % 3 AS ne,
                   1 + n % 4 AS chunks,
                   n % 40 + v % 8 AS mdat
            FROM d),
      t AS (SELECT *,
                   list_transform(range(nst), j -> 1 + (v + j) % 4) AS cnts,
                   list_transform(range(nst), j -> 10 + (n + j) % 20) AS dels,
                   list_transform(range(ne), e ->
                     CASE WHEN n % 2 = 0 AND e = 0 THEN 300 + v % 100
                          ELSE 200 + (n + e * 37) % 300 END) AS segs,
                   list_transform(range(ne), e ->
                     CASE WHEN n % 2 = 0 AND e = 0 THEN -1
                          ELSE (v + e * 11) % 500 END) AS mtimes
            FROM g),
      u AS (SELECT *,
                   CAST(list_sum(cnts) AS BIGINT) AS s_tot,
                   CAST(list_sum(list_transform(range(nst), j ->
                     cnts[j + 1] * dels[j + 1])) AS BIGINT) AS stts_d
            FROM t),
      w AS (SELECT *,
                   list_transform(range(CAST(s_tot AS INTEGER)), i ->
                     CASE WHEN n % 3 = 0 THEN ((v + i * 7) % 9) * 5
                          ELSE ((v + i * 7) % 9 - 3) * 10 END) AS offs,
                   CASE WHEN v % 2 = 0 THEN (100 + v % 50) * s_tot
                        ELSE list_sum(list_transform(range(CAST(s_tot AS INTEGER)),
                          i -> 50 + (i * 13 + n) % 100)) END AS sbytes
            FROM u)
      SELECT doc_id,
             CAST(ne AS INTEGER) AS n_edits,
             CAST(CASE WHEN n % 2 = 0 THEN 300 + v % 100 ELSE 0 END AS BIGINT)
               AS initial_delay,
             CAST(CASE WHEN n % 2 = 0 AND ne = 1 THEN 0
                       WHEN n % 2 = 0 THEN (v + 11) % 500
                       ELSE v % 500 END AS BIGINT) AS start_trim,
             CAST(list_sum(segs) AS BIGINT) AS edit_dur,
             CAST(CAST(list_sum(segs) AS BIGINT) * 1000 // mts AS BIGINT)
               AS edited_ms,
             s_tot AS sample_count,
             stts_d AS stts_dur,
             s_tot AS ctts_entries,
             CAST(list_max(offs) AS BIGINT) AS ctts_max,
             CAST(list_sum(offs) AS BIGINT) AS ctts_sum,
             CAST(sbytes AS BIGINT) AS sample_bytes,
             v % 2 = 0 AS uniform_sz,
             CAST(chunks AS BIGINT) AS chunk_count,
             CAST(20 + 8 + 108
               + 8 + 92 + (24 + 12 * ne)
               + 8 + 32 + 33
               + 8 + 8 + 32
               + (16 + 8 * nst) + (16 + 8 * s_tot)
               + (CASE WHEN v % 2 = 0 THEN 20 ELSE 20 + 4 * s_tot END)
               + (16 + 4 * chunks)
               + 8 + mdat AS BIGINT) AS file_bytes
      FROM w ORDER BY doc_id"""))

  /** EBML/MATROSKA (WebM) CONTAINER PROBE under the oracle gate — the
    * other half of the video-lake container story next to q226's
    * ISO-BMFF: per document, synthesize a VALID Matroska/WebM stream
    * (EBML header with DocType/versions, Segment with Info —
    * 3-octet TimestampScale, 8-octet-double Duration, app strings —,
    * Tracks with video PixelWidth/Height and audio
    * SamplingFrequency/Channels subtrees, and Clusters of
    * timestamped SimpleBlocks), then REALLY walk it
    * ([[graft.operators.MkvProbe.probe]]: RFC 8794 varint ids/sizes,
    * exact element tiling, big-endian uints with leading zeros, 4/8-octet
    * floats) and emit the container metadata. Block payloads are counted,
    * never decoded — the [[graft.operators.Mp4Boxes]] sample-data
    * contract applied to EBML. The oracle recomputes every number from
    * the spec layout in closed form — element totals as id-width + the
    * fixed 2-octet size form + body, duration as exact
    * ticks x scale / 1e6 integer math — so a varint-width slip, a
    * mistiled element, or a float-width error lands in the hash.
    */
  val q236MkvProbe: QueryDef = QueryDef(
    "q236_mkv_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.MkvProbe
        val docType = if (r.v % 2 == 0) "webm" else "matroska"
        val dtv = 2L + r.n % 3
        val scale = Seq(1000000L, 500000L, 250000L)(r.v % 3)
        val durTicks = (r.n.toLong * 50 + r.v).toDouble
        val muxApp = "mux" + ('a' + r.v % 26).toChar
        val wriApp = "wri" + ('a' + r.n % 26).toChar
        val k = 1 + (r.doc_id % 3).toInt
        val tracks = (0 until k).map { t =>
          val video = (r.v + t) % 2 == 0
          if (video) MkvProbe.SynthMkvTrack(
            number = t + 1, uid = (r.v + t) % 200 + 1, trackType = 1,
            codecId = Seq("V_VP8", "V_VP9", "V_AV1")((r.n + t) % 3),
            width = 16L * (1 + (r.v + t) % 80),
            height = 16L * (1 + (r.n + t) % 45))
          else MkvProbe.SynthMkvTrack(
            number = t + 1, uid = (r.v + t) % 200 + 1, trackType = 2,
            codecId = Seq("A_OPUS", "A_VORBIS", "A_FLAC")((r.n + t) % 3),
            sampleRate = Seq(48000.0, 44100.0, 16000.0)((r.v + t) % 3),
            channels = 1L + (r.v + t) % 2)
        }
        val clusters = (0 until r.n % 3).map { c =>
          MkvProbe.SynthCluster(c * 1000L + r.v % 500,
            (0 until 1 + (r.n + c) % 3).map(j => 20 + (r.v + c * 7 + j * 3) % 40))
        }
        val bytes = MkvProbe.synth(docType, dtv, scale, durTicks, muxApp,
          wriApp, tracks, clusters, (ci, i) => ci * 13 + i * 5 + r.v)
        val info = MkvProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized mkv failed to probe: doc ${r.doc_id}"))
        val nVideo = info.tracks.count(_.trackType == 1)
        (r.doc_id, info.docType, info.docTypeVersion, info.timestampScale,
          info.durationMs, info.muxingApp, info.writingApp, info.nTracks,
          nVideo, info.nTracks - nVideo,
          info.tracks.map(_.codecId).mkString(","),
          info.tracks.map(_.width).max, info.tracks.map(_.height).max,
          info.tracks.map(_.sampleRate).sum.toLong,
          info.tracks.map(_.channels).sum, info.clusterCount,
          info.blockCount, info.blockBytes, bytes.length.toLong)
      }
      probed.toDF("doc_id", "doc_type", "dt_version", "ts_scale",
          "duration_ms", "mux_app", "wri_app", "n_tracks", "n_video",
          "n_audio", "codecs", "max_width", "max_height", "sum_rate",
          "sum_channels", "n_clusters", "n_blocks", "block_bytes",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 2 = 0 THEN 'webm' ELSE 'matroska' END AS dt,
                   CAST(2 + n % 3 AS BIGINT) AS dtv,
                   [1000000, 500000, 250000][v % 3 + 1] AS scale,
                   CAST(n AS BIGINT) * 50 + v AS ticks,
                   CAST(1 + doc_id % 3 AS INTEGER) AS k,
                   n % 3 AS nc
            FROM d),
      t AS (SELECT *,
                   list_transform(range(k), t -> (v + t) % 2 = 0) AS isv,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN ['V_VP8', 'V_VP9', 'V_AV1'][(n + t) % 3 + 1]
                       ELSE ['A_OPUS', 'A_VORBIS', 'A_FLAC'][(n + t) % 3 + 1] END) AS cods,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN 16 * (1 + (v + t) % 80) ELSE 0 END) AS ws,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN 16 * (1 + (n + t) % 45) ELSE 0 END) AS hs,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN 0 ELSE [48000, 44100, 16000][(v + t) % 3 + 1] END) AS rates,
                   list_transform(range(k), t -> CASE WHEN (v + t) % 2 = 0
                       THEN 0 ELSE 1 + (v + t) % 2 END) AS chans,
                   list_transform(range(nc), c ->
                     5 + list_sum(list_transform(range(1 + (n + c) % 3), j ->
                       3 + 4 + 20 + (v + c * 7 + j * 3) % 40))) AS cluster_bodies,
                   list_transform(range(nc), c ->
                     list_sum(list_transform(range(1 + (n + c) % 3), j ->
                       4 + 20 + (v + c * 7 + j * 3) % 40))) AS cluster_blockbytes,
                   list_transform(range(nc), c -> 1 + (n + c) % 3) AS cluster_nblocks
            FROM g),
      u AS (SELECT *,
                   CAST(list_sum(list_transform(range(k), t ->
                     19 + len(cods[t + 1])
                       + (CASE WHEN isv[t + 1] THEN 13 ELSE 18 END)))
                     AS BIGINT) AS track_entries,
                   CAST(COALESCE(list_sum(list_transform(range(nc), c ->
                     6 + cluster_bodies[c + 1])), 0) AS BIGINT) AS clusters_total
            FROM t)
      SELECT doc_id,
             dt AS doc_type,
             dtv AS dt_version,
             CAST(scale AS BIGINT) AS ts_scale,
             CAST(ticks * scale // 1000000 AS BIGINT) AS duration_ms,
             'mux' || chr(CAST(97 + v % 26 AS INTEGER)) AS mux_app,
             'wri' || chr(CAST(97 + n % 26 AS INTEGER)) AS wri_app,
             CAST(k AS INTEGER) AS n_tracks,
             CAST(len(list_filter(isv, x -> x)) AS INTEGER) AS n_video,
             CAST(k - len(list_filter(isv, x -> x)) AS INTEGER) AS n_audio,
             array_to_string(cods, ',') AS codecs,
             CAST(list_max(ws) AS BIGINT) AS max_width,
             CAST(list_max(hs) AS BIGINT) AS max_height,
             CAST(list_sum(rates) AS BIGINT) AS sum_rate,
             CAST(list_sum(chans) AS BIGINT) AS sum_channels,
             CAST(nc AS BIGINT) AS n_clusters,
             CAST(COALESCE(list_sum(cluster_nblocks), 0) AS BIGINT) AS n_blocks,
             CAST(COALESCE(list_sum(cluster_blockbytes), 0) AS BIGINT) AS block_bytes,
             CAST(20 + len(dt)
               + 6 + 42 + 6 + track_entries + clusters_total
               AS BIGINT) AS file_bytes
      FROM u ORDER BY doc_id"""))

  /** ZIP CENTRAL-DIRECTORY WALK + REAL MEMBER EXTRACTION under the
    * oracle gate — the docx/epub/jar container story: per document,
    * synthesize a VALID single-disk archive (stored members and
    * raw-deflate members in the closed-form single-stored-block
    * encoding, true CRC-32s, an EOCD comment on every 4th doc), then
    * REALLY walk it ([[graft.operators.ZipProbe.probe]]: backward EOCD
    * scan over the comment, exact central-directory tiling, full
    * local-header cross-check) and EXTRACT every member
    * ([[graft.operators.ZipProbe.extract]]: JDK raw inflate for method
    * 8, then CRC-32 and size verification) — the first and last members'
    * extracted text goes straight into the hash, so a broken inflate, a
    * CRC miss, or an offset slip is a row-level failure. The oracle
    * rebuilds names, methods, sizes, offsets, and the extracted strings
    * in closed form (deflate is byte-predictable because the synth uses
    * the BTYPE=00 stored-block form: csize = usize + 5).
    */
  val q237ZipProbe: QueryDef = QueryDef(
    "q237_zip_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.ZipProbe
        val k = 1 + (r.n + r.v) % 4
        val members = (0 until k).map { i =>
          val content = Array.fill(10 + (r.n + i) % 30)(
            ('a' + (r.v + i) % 26).toByte)
          ZipProbe.SynthMember(
            name = s"doc/${('a' + (r.n + i) % 26).toChar}$i.txt",
            content = content,
            method = if ((r.v + i) % 2 == 0) 0 else 8)
        }
        val comment = if (r.n % 4 == 0) "zc" + ('a' + r.v % 26).toChar else ""
        val bytes = ZipProbe.synth(members, comment)
        val info = ZipProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized zip failed to probe: doc ${r.doc_id}"))
        val extracted = info.entries.map { e =>
          ZipProbe.extract(bytes, e)
            .getOrElse(sys.error(s"member ${e.name} failed extraction: doc ${r.doc_id}"))
        }
        (r.doc_id, info.nEntries,
          info.entries.map(_.name).mkString(","),
          info.entries.map(_.method).mkString(","),
          info.totalUncompressed, info.totalCompressed,
          info.cdOffset, info.cdSize, info.comment,
          new String(extracted.head, "UTF-8"),
          new String(extracted.last, "UTF-8"),
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_entries", "names", "methods", "total_usize",
          "total_csize", "cd_offset", "cd_size", "comment", "content_first",
          "content_last", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   1 + (n + v) % 4 AS k,
                   CASE WHEN n % 4 = 0
                        THEN 'zc' || chr(CAST(97 + v % 26 AS INTEGER))
                        ELSE '' END AS cmt
            FROM d),
      t AS (SELECT *,
                   list_transform(range(k), i ->
                     'doc/' || chr(CAST(97 + (n + i) % 26 AS INTEGER))
                            || CAST(i AS VARCHAR) || '.txt') AS names_l,
                   list_transform(range(k), i ->
                     CASE WHEN (v + i) % 2 = 0 THEN '0' ELSE '8' END) AS methods_l,
                   list_transform(range(k), i -> 10 + (n + i) % 30) AS us,
                   list_transform(range(k), i ->
                     CASE WHEN (v + i) % 2 = 0 THEN 10 + (n + i) % 30
                          ELSE 15 + (n + i) % 30 END) AS cs
            FROM g)
      SELECT doc_id,
             CAST(k AS INTEGER) AS n_entries,
             array_to_string(names_l, ',') AS names,
             array_to_string(methods_l, ',') AS methods,
             CAST(list_sum(us) AS BIGINT) AS total_usize,
             CAST(list_sum(cs) AS BIGINT) AS total_csize,
             CAST(list_sum(list_transform(range(k), i -> 40 + cs[i + 1]))
               AS BIGINT) AS cd_offset,
             CAST(56 * k AS BIGINT) AS cd_size,
             cmt AS comment,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), 10 + n % 30)
               AS content_first,
             repeat(chr(CAST(97 + (v + k - 1) % 26 AS INTEGER)),
               10 + (n + k - 1) % 30) AS content_last,
             CAST(list_sum(list_transform(range(k), i -> 40 + cs[i + 1]))
               + 56 * k + 22 + len(cmt) AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** FLAC CONTAINER PROBE under the oracle gate — the lossless-audio
    * container story: per document, synthesize a VALID FLAC stream
    * (STREAMINFO with the 20/3/5/36-bit packed stream parameters, an
    * optional VORBIS_COMMENT block — little-endian lengths inside the
    * big-endian container, the classic FLAC trap —, an optional padding
    * block, and an opaque frame span), then REALLY walk it
    * ([[graft.operators.FlacProbe.probe]]: block headers with the
    * last-block flag, the bit unpacking, the endianness flip, exact
    * vorbis tiling) and emit the stream metadata. Audio frames are
    * counted, never decoded — the [[graft.operators.MpegFrames]] PCM
    * contract applied to FLAC. The oracle recomputes every number and
    * string in closed form — the packed-field decode as integer
    * arithmetic, durations as exact samples x 1000 / rate, byte totals
    * over the variable block set — so a bit-offset slip, an endianness
    * mixup, or a block-walk error lands in the hash.
    */
  val q238FlacProbe: QueryDef = QueryDef(
    "q238_flac_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.FlacProbe
        val rate = Seq(44100, 48000, 96000, 22050)(r.v % 4)
        val channels = 1 + r.n % 4
        val bps = Seq(16, 24, 8)(r.v % 3)
        val totalSamples = r.n.toLong * 1000 + r.v
        val withComment = r.n % 6 != 5
        val vendor = "gf" + ('a' + r.v % 26).toChar
        val comments = Seq(
          ("TITLE", "t" + ('a' + r.v % 26).toChar.toString * (1 + r.n % 6)),
          ("ARTIST", "a" + ('a' + (r.n + r.v) % 26).toChar),
          ("ALBUM", "b" + ('a' + r.n % 26).toChar.toString * (1 + r.v % 4))) ++
          (if (r.v % 5 == 0)
            Seq(("GENRE", "g" + ('a' + (2 * r.v + r.n) % 26).toChar)) else Nil)
        val paddingLen = if (r.v % 3 == 0) r.n % 200 else -1
        val frameLen = 50 + (r.n * 3 + r.v) % 500
        val bytes = FlacProbe.synth(1152, 4096 + r.n % 100, 200 + r.v % 50,
          2000 + r.n % 500, rate, channels, bps, totalSamples, vendor,
          comments, withComment, paddingLen, frameLen,
          i => i * 19 + r.v)
        val info = FlacProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized flac failed to probe: doc ${r.doc_id}"))
        (r.doc_id, info.info.sampleRate, info.info.channels,
          info.info.bitsPerSample, info.info.totalSamples, info.durationMs,
          info.info.minBlock, info.info.maxBlock, info.info.minFrame,
          info.info.maxFrame, info.vendor, info.comments.length,
          info.tag("TITLE").orNull, info.tag("ARTIST").orNull,
          info.nBlocks, info.paddingBytes, info.frameBytes,
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "sample_rate", "channels", "bps",
          "total_samples", "duration_ms", "min_block", "max_block",
          "min_frame", "max_frame", "vendor", "n_comments", "title",
          "artist", "n_blocks", "padding_bytes", "frame_bytes",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   [44100, 48000, 96000, 22050][v % 4 + 1] AS rate,
                   CAST(n AS BIGINT) * 1000 + v AS ts,
                   n % 6 != 5 AS wc,
                   v % 5 = 0 AS genre,
                   CASE WHEN v % 3 = 0 THEN n % 200 ELSE -1 END AS padlen,
                   50 + (n * 3 + v) % 500 AS flen
            FROM d),
      t AS (SELECT *,
                   CASE WHEN wc THEN
                     4 + (4 + 3) + 4
                       + (4 + 6 + 2 + n % 6)
                       + (4 + 7 + 2)
                       + (4 + 6 + 2 + v % 4)
                       + (CASE WHEN genre THEN 4 + 6 + 2 ELSE 0 END)
                   ELSE 0 END AS cblock,
                   CASE WHEN padlen >= 0 THEN 4 + padlen ELSE 0 END AS pblock
            FROM g)
      SELECT doc_id,
             CAST(rate AS INTEGER) AS sample_rate,
             CAST(1 + n % 4 AS INTEGER) AS channels,
             [16, 24, 8][v % 3 + 1] AS bps,
             ts AS total_samples,
             CAST(ts * 1000 // rate AS BIGINT) AS duration_ms,
             1152 AS min_block,
             CAST(4096 + n % 100 AS INTEGER) AS max_block,
             CAST(200 + v % 50 AS INTEGER) AS min_frame,
             CAST(2000 + n % 500 AS INTEGER) AS max_frame,
             CASE WHEN wc THEN 'gf' || chr(CAST(97 + v % 26 AS INTEGER))
                  ELSE '' END AS vendor,
             CAST(CASE WHEN wc THEN 3 + (CASE WHEN genre THEN 1 ELSE 0 END)
                  ELSE 0 END AS INTEGER) AS n_comments,
             CASE WHEN wc THEN 't' ||
               repeat(chr(CAST(97 + v % 26 AS INTEGER)), 1 + n % 6)
               ELSE NULL END AS title,
             CASE WHEN wc THEN 'a' || chr(CAST(97 + (n + v) % 26 AS INTEGER))
                  ELSE NULL END AS artist,
             CAST(1 + (CASE WHEN wc THEN 1 ELSE 0 END)
               + (CASE WHEN padlen >= 0 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_blocks,
             CAST(greatest(padlen, 0) AS BIGINT) AS padding_bytes,
             CAST(flen AS BIGINT) AS frame_bytes,
             CAST(4 + 38 + cblock + pblock + flen AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** OGG PAGE WALK + CRC VERIFICATION under the oracle gate — the
    * .ogg/.opus story: per document, synthesize a VALID single-stream
    * Ogg file (a BOS page carrying the real OpusHead or Vorbis ID
    * header, data pages with 255-lacing packet segmentation, EOS on the
    * last, TRUE Ogg CRC-32s — the 0x04c11db7 unreflected variant, not
    * zlib's), then REALLY walk it ([[graft.operators.OggProbe.probe]]:
    * capture pattern, sequence continuity, continuation-flag truth,
    * per-page checksum verification, lacing packet counting, ID-header
    * decode) and emit the stream metadata. Audio packets are counted,
    * never decoded. The oracle recomputes everything in closed form —
    * page overhead as 27 + segments, Opus duration as the exact
    * (granule - preSkip) x 1000 / 48000, Vorbis duration at its own
    * granule rate — so a lacing slip, a CRC-table error, or a
    * granule-rate mixup lands in the hash.
    */
  val q239OggProbe: QueryDef = QueryDef(
    "q239_ogg_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.OggProbe
        val serial = 0x10000L + r.v * 7 + r.n % 13
        val opus = r.v % 2 == 0
        val channels = 1 + r.n % 2
        val preSkip = 312 + r.v % 100
        val vorbisRate = Seq(44100L, 48000L, 22050L)(r.v % 3)
        val idPacket =
          if (opus) OggProbe.opusHead(channels, preSkip, 48000L)
          else OggProbe.vorbisHead(channels, vorbisRate)
        val np = 1 + r.n % 4
        val step = 960L * (2 + r.v % 5)
        val pages = (0 until np).map { i =>
          OggProbe.SynthPage((i + 1) * step,
            (0 until 1 + (r.n + i) % 3).map(j => 40 + (r.v + i * 11 + j * 7) % 200))
        }
        val bytes = OggProbe.synth(serial, idPacket, pages,
          (pi, k) => pi * 17 + k * 3 + r.v)
        val info = OggProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized ogg failed to probe: doc ${r.doc_id}"))
        (r.doc_id, info.serial, info.codec.name, info.codec.channels,
          info.codec.sampleRate, info.codec.preSkip, info.nPages,
          info.finalGranule, info.durationMs, info.nPackets,
          info.bodyBytes, bytes.length.toLong)
      }
      probed.toDF("doc_id", "serial", "codec", "channels", "sample_rate",
          "pre_skip", "n_pages", "final_granule", "duration_ms",
          "n_packets", "body_bytes", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   65536 + v * 7 + n % 13 AS serial,
                   v % 2 = 0 AS opus,
                   1 + n % 2 AS channels,
                   312 + v % 100 AS pre_skip,
                   [44100, 48000, 22050][v % 3 + 1] AS vrate,
                   1 + n % 4 AS np,
                   960 * (2 + v % 5) AS step
            FROM d),
      t AS (SELECT *,
                   CASE WHEN opus THEN 19 ELSE 30 END AS idlen,
                   list_transform(range(np), i -> 1 + (n + i) % 3) AS kps,
                   list_transform(range(np), i ->
                     list_sum(list_transform(range(1 + (n + i) % 3), j ->
                       40 + (v + i * 11 + j * 7) % 200))) AS page_bodies
            FROM g)
      SELECT doc_id,
             CAST(serial AS BIGINT) AS serial,
             CASE WHEN opus THEN 'opus' ELSE 'vorbis' END AS codec,
             CAST(channels AS INTEGER) AS channels,
             CAST(CASE WHEN opus THEN 48000 ELSE vrate END AS BIGINT)
               AS sample_rate,
             CAST(CASE WHEN opus THEN pre_skip ELSE 0 END AS INTEGER)
               AS pre_skip,
             CAST(1 + np AS INTEGER) AS n_pages,
             CAST(np * step AS BIGINT) AS final_granule,
             CAST(CASE WHEN opus
                  THEN (np * step - pre_skip) * 1000 // 48000
                  ELSE CAST(np AS BIGINT) * step * 1000 // vrate END
               AS BIGINT) AS duration_ms,
             CAST(1 + list_sum(kps) AS BIGINT) AS n_packets,
             CAST(idlen + list_sum(page_bodies) AS BIGINT) AS body_bytes,
             CAST((27 + 1 + idlen)
               + list_sum(list_transform(range(np), i ->
                   27 + kps[i + 1] + page_bodies[i + 1]))
               AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** UNIFIED CONTAINER PROBE, WIDENED — q232's ffprobe front door over
    * the FULL round-10 container surface: per document the payload is
    * (by doc_id mod 9) a real MP4, MPEG-1 audio, PCM16 WAV, TIFF,
    * Matroska/WebM, FLAC, Ogg/Opus, ZIP, or RAW TEXT, and
    * [[graft.operators.Multimodal.probeContainers]] dispatches all
    * eight families in false-positive-safe order (ZIP last — its magic
    * is not anchored at offset 0), with text surfacing as EXPLICIT
    * all-null reject rows. The oracle recomputes every family's
    * metadata and exact payload size closed-form, so a misdispatch, a
    * false positive, or a regression in ANY prober lands in this one
    * hash.
    */
  val q240UnifiedProbe: QueryDef = QueryDef(
    "q240_unified_probe",
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
        import graft.operators._
        val payload: Array[Byte] = (docId % 9) match {
          case 0 =>
            Mp4Boxes.synthMp4("isom", v.toLong, Seq("mp41"),
              600L * (1 + v % 5), n.toLong * 1000 + v * 17,
              Seq(Mp4Boxes.SynthTrack(1, "vide", "avc1",
                320, 240, 30000L, 90000L, "und")),
              mdatLen = n % 32, i => i * 11 + v)
          case 1 =>
            MpegFrames.synthStream(1 + v % 3, n % 3,
              (0 until 2 + n % 4).map(j => (1 + (v + j) % 14, (n + j) % 2 == 0)),
              (fi, j) => fi * 7 + j * 13)
          case 2 =>
            MediaCodecs.encodeWavPcm16(8000,
              Array.tabulate(10 + n % 20)(i => ((v * 31 + i * 97) % 8192).toShort))
          case 3 =>
            TiffProbe.synthTiff(v % 2 == 0, (0 until 1 + n % 3).map(p =>
              TiffProbe.SynthPage(100 + p, 80 + p, 8, 1, 1, 1)))
          case 4 =>
            MkvProbe.synth("webm", 2, 1000000L, (n.toLong * 20 + v).toDouble,
              "m", "w", Seq(MkvProbe.SynthMkvTrack(1, 1, 1, "V_VP9",
                width = 320, height = 240)), Nil, (_, _) => 0)
          case 5 =>
            FlacProbe.synth(1152, 4096, 0, 0, 48000, 2, 16,
              n.toLong * 100 + v, "v", Nil, withComment = false,
              paddingLen = -1, frameLen = n % 50, i => i)
          case 6 =>
            OggProbe.synth(1234L, OggProbe.opusHead(2, 312, 48000L),
              Seq(OggProbe.SynthPage(1920L * (1 + n % 3), Seq(30 + v % 50))),
              (_, _) => 0)
          case 7 =>
            ZipProbe.synth(Seq(ZipProbe.SynthMember("doc/entry.txt",
              Array.fill(10 + n % 20)(('a' + v % 26).toByte), 0)), "")
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
               FROM d WHERE doc_id % 9 = 1),
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
             CASE d.doc_id % 9 WHEN 0 THEN 'mp4' WHEN 1 THEN 'mpeg'
                               WHEN 2 THEN 'wav' WHEN 3 THEN 'tiff'
                               WHEN 4 THEN 'mkv' WHEN 5 THEN 'flac'
                               WHEN 6 THEN 'ogg' WHEN 7 THEN 'zip'
             END AS container,
             CASE d.doc_id % 9
               WHEN 0 THEN (CAST(d.n AS BIGINT) * 1000 + d.v * 17) * 1000
                             // (600 * (1 + d.v % 5))
               WHEN 1 THEN CAST(m.k AS BIGINT) * m.spf * 1000 // m.sr
               WHEN 2 THEN CAST(10 + d.n % 20 AS BIGINT) * 1000 // 8000
               WHEN 4 THEN CAST(d.n AS BIGINT) * 20 + d.v
               WHEN 5 THEN (CAST(d.n AS BIGINT) * 100 + d.v) * 1000 // 48000
               WHEN 6 THEN (1920 * (1 + CAST(d.n AS BIGINT) % 3) - 312)
                             * 1000 // 48000
             END AS duration_ms,
             CASE d.doc_id % 9
               WHEN 3 THEN 1 + d.n % 3
               WHEN 8 THEN NULL
               ELSE 1
             END AS n_streams,
             CASE d.doc_id % 9 WHEN 0 THEN 'avc1'
                               WHEN 1 THEN 'mp' || CAST(1 + d.v % 3 AS VARCHAR)
                               WHEN 2 THEN 'pcm16'
                               WHEN 3 THEN 'tiff'
                               WHEN 4 THEN 'V_VP9'
                               WHEN 5 THEN 'flac'
                               WHEN 6 THEN 'opus'
                               WHEN 7 THEN 'stored'
             END AS codec,
             CAST(CASE d.doc_id % 9
               WHEN 0 THEN 20 + 8 + 108 + 221 + 8 + d.n % 32
               WHEN 1 THEN m.stream_bytes
               WHEN 2 THEN 44 + 2 * (10 + d.n % 20)
               WHEN 3 THEN 8 + 78 * (1 + d.n % 3)
               WHEN 4 THEN 109
               WHEN 5 THEN 42 + d.n % 50
               WHEN 6 THEN 105 + d.v % 50
               WHEN 7 THEN 134 + d.n % 20
               ELSE d.n
             END AS BIGINT) AS payload_bytes
      FROM d LEFT JOIN mpeg2 m ON d.doc_id = m.doc_id
      ORDER BY d.doc_id"""))

  /** WARC RECORD WALK under the oracle gate — the Common-Crawl-shaped
    * container a 100 TB web-text lake actually arrives in: per
    * document, synthesize a VALID WARC file (a warcinfo record then
    * request/response pairs, each response block a real HTTP/1.1
    * message), then REALLY walk it
    * ([[graft.operators.WarcProbe.probe]]: version line, named-field
    * headers, Content-Length-driven block extraction with the exact
    * CRLF CRLF trailer, HTTP status-line + body split inside response
    * blocks) and emit the crawl summary a curation pipeline starts
    * from — record counts by type, status tallies, and the FIRST
    * response body text straight into the hash. The oracle rebuilds
    * every count, string, and byte total in closed form (header-line
    * lengths as template arithmetic incl. the variable-width record
    * ids and Content-Length digit counts).
    */
  val q241WarcWalk: QueryDef = QueryDef(
    "q241_warc_walk",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.WarcProbe
        val date = "2020-01-01T00:00:00Z"
        val np = 1 + r.n % 3
        val info = WarcProbe.SynthRecord("warcinfo", (r.v * 1000).toString,
          date, None, "software: graft\r\n".getBytes("ISO-8859-1"))
        val pairs = (0 until np).flatMap { i =>
          val uri = s"http://ex.com/p$i"
          val status = if ((r.v + i) % 5 == 0) 404 else 200
          val body = Array.fill(20 + (r.n + i) % 40)(
            ('a' + (r.v + i) % 26).toByte)
          Seq(
            WarcProbe.SynthRecord("request", (r.v * 1000 + 2 * i + 1).toString,
              date, Some(uri),
              s"GET /p$i HTTP/1.1\r\nHost: ex.com\r\n\r\n".getBytes("ISO-8859-1")),
            WarcProbe.SynthRecord("response", (r.v * 1000 + 2 * i + 2).toString,
              date, Some(uri), WarcProbe.httpResponse(status, body)))
        }
        val bytes = WarcProbe.synth(info +: pairs)
        val parsed = WarcProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized warc failed to probe: doc ${r.doc_id}"))
        val responses = parsed.ofType("response")
        val statuses = responses.flatMap(_.status)
        val first = responses.head
        (r.doc_id, parsed.nRecords, parsed.ofType("warcinfo").length,
          parsed.ofType("request").length, responses.length,
          parsed.totalBlockBytes,
          statuses.count(_ == 200), statuses.count(_ == 404),
          statuses.map(_.toLong).sum,
          first.uri.orNull, first.status.get,
          new String(first.httpBody.get, "ISO-8859-1"),
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_records", "n_info", "n_requests",
          "n_responses", "total_block_bytes", "n_ok", "n_notfound",
          "sum_status", "first_uri", "first_status", "first_body",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 1 + n % 3 AS np FROM d),
      t AS (SELECT *,
                   list_transform(range(np), i -> 20 + (n + i) % 40) AS blens,
                   list_transform(range(np), i ->
                     CASE WHEN (v + i) % 5 = 0 THEN 404 ELSE 200 END) AS sts,
                   len(CAST(v * 1000 AS VARCHAR)) AS id0
            FROM g),
      u AS (SELECT *,
                   -- per-record byte accounting: 109 + len(type) +
                   -- len(<id>) + len(str(blockLen)) + block
                   -- (+ 19 + len(uri) when a target URI is present)
                   136 + id0 AS info_bytes,
                   list_transform(range(np), i ->
                     187 + len(CAST(v * 1000 + 2 * i + 1 AS VARCHAR)))
                     AS req_bytes,
                   list_transform(range(np), i ->
                     197 + len(CAST(v * 1000 + 2 * i + 2 AS VARCHAR))
                         + len(CAST(45 + blens[i + 1] AS VARCHAR))
                         + blens[i + 1]) AS resp_bytes
            FROM t)
      SELECT doc_id,
             CAST(1 + 2 * np AS INTEGER) AS n_records,
             1 AS n_info,
             CAST(np AS INTEGER) AS n_requests,
             CAST(np AS INTEGER) AS n_responses,
             CAST(17 + np * (34 + 45) + list_sum(blens) AS BIGINT)
               AS total_block_bytes,
             CAST(len(list_filter(sts, x -> x = 200)) AS INTEGER) AS n_ok,
             CAST(len(list_filter(sts, x -> x = 404)) AS INTEGER)
               AS n_notfound,
             CAST(list_sum(sts) AS BIGINT) AS sum_status,
             'http://ex.com/p0' AS first_uri,
             CAST(sts[1] AS INTEGER) AS first_status,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), 20 + n % 40)
               AS first_body,
             CAST(info_bytes + list_sum(req_bytes) + list_sum(resp_bytes)
               AS BIGINT) AS file_bytes
      FROM u ORDER BY doc_id"""))

  /** WARC.GZ MEMBER WALK under the oracle gate — the layout crawl
    * archives actually ship in: ONE GZIP MEMBER PER RECORD, so readers
    * can seek to a member and decompress just that record; building
    * that member index IS this walk. Per document, q241's records are
    * INDIVIDUALLY gzipped ([[graft.operators.GzipMembers.synth]]:
    * real headers with FNAME on alternating members, stored-block
    * deflate for closed-form sizes, TRUE CRC-32/ISIZE trailers), the
    * member chain is walked ([[graft.operators.GzipMembers.walk]]:
    * header-field skip rules, real JDK inflation to find each member
    * boundary, trailer verification — one corrupt byte anywhere
    * rejects), and the reassembled bytes are re-probed as a WARC
    * ([[graft.operators.WarcProbe.probe]]) — the decompress→parse
    * chain a crawl reader really runs, with the first response body
    * landing in the hash. The oracle rebuilds member sizes as
    * 23 + record + FNAME bytes and the record sizes by q241's template
    * arithmetic.
    */
  val q242WarcGz: QueryDef = QueryDef(
    "q242_warc_gz",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.{GzipMembers, WarcProbe}
        val date = "2020-01-01T00:00:00Z"
        val uri = "http://ex.com/p0"
        val status = if (r.v % 5 == 0) 404 else 200
        val body = Array.fill(20 + r.n % 40)(('a' + r.v % 26).toByte)
        val records = Seq(
          WarcProbe.SynthRecord("warcinfo", (r.v * 1000).toString, date,
            None, "software: graft\r\n".getBytes("ISO-8859-1")),
          WarcProbe.SynthRecord("request", (r.v * 1000 + 1).toString, date,
            Some(uri),
            "GET /p0 HTTP/1.1\r\nHost: ex.com\r\n\r\n".getBytes("ISO-8859-1")),
          WarcProbe.SynthRecord("response", (r.v * 1000 + 2).toString, date,
            Some(uri), WarcProbe.httpResponse(status, body)))
        val recordBytes = records.map(rec => WarcProbe.synth(Seq(rec)))
        val members = recordBytes.zipWithIndex.map { case (bs, i) =>
          (bs, if (i % 2 == 0) Some(s"r$i") else None)
        }
        val gz = GzipMembers.synth(members)
        val walked = GzipMembers.walk(gz)
          .getOrElse(sys.error(s"gz member walk failed: doc ${r.doc_id}"))
        val reassembled = walked.toArray.flatMap(_.content)
        val warc = WarcProbe.probe(reassembled)
          .getOrElse(sys.error(s"reassembled warc failed: doc ${r.doc_id}"))
        val resp = warc.ofType("response").head
        (r.doc_id, walked.length,
          walked.flatMap(_.name).mkString(","),
          walked.map(_.compressedLength.toLong).sum,
          walked.map(_.content.length.toLong).sum,
          walked.head.compressedLength.toLong,
          warc.nRecords, resp.status.get,
          new String(resp.httpBody.get, "ISO-8859-1"),
          gz.length.toLong)
      }
      probed.toDF("doc_id", "n_members", "member_names", "sum_compressed",
          "sum_decompressed", "member0_bytes", "n_records", "first_status",
          "first_body", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   20 + n % 40 AS blen,
                   len(CAST(v * 1000 AS VARCHAR)) AS id0,
                   len(CAST(v * 1000 + 1 AS VARCHAR)) AS id1,
                   len(CAST(v * 1000 + 2 AS VARCHAR)) AS id2
            FROM d),
      t AS (SELECT *,
                   136 + id0 AS rec0,
                   187 + id1 AS rec1,
                   197 + id2 + len(CAST(45 + blen AS VARCHAR)) + blen AS rec2
            FROM g)
      SELECT doc_id,
             3 AS n_members,
             'r0,r2' AS member_names,
             CAST((23 + rec0 + 3) + (23 + rec1) + (23 + rec2 + 3) AS BIGINT)
               AS sum_compressed,
             CAST(rec0 + rec1 + rec2 AS BIGINT) AS sum_decompressed,
             CAST(23 + rec0 + 3 AS BIGINT) AS member0_bytes,
             3 AS n_records,
             CAST(CASE WHEN v % 5 = 0 THEN 404 ELSE 200 END AS INTEGER)
               AS first_status,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), 20 + n % 40)
               AS first_body,
             CAST((23 + rec0 + 3) + (23 + rec1) + (23 + rec2 + 3) AS BIGINT)
               AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** TAR / WEBDATASET SHARD WALK under the oracle gate — the container
    * large-scale ML training samples actually ship in: tar shards whose
    * members group into samples by name stem (s0.txt + s0.cls + ...),
    * streamed sequentially because tar needs no central directory. Per
    * document, synthesize a VALID ustar shard
    * ([[graft.operators.TarProbe.synth]]: real 512-byte headers with
    * TRUE checksums, octal fields, zero-padded data blocks, the
    * two-zero-block terminator, an optional leading directory entry),
    * then REALLY walk it ([[graft.operators.TarProbe.probe]]: checksum
    * verification per header, octal decode, prefix rule, pad-byte
    * validation) and emit the shard summary — member/sample counts via
    * the WebDataset stem grouping, and the first sample's text and
    * label straight into the hash. The oracle rebuilds every count,
    * string, and the exact 512-block file geometry in closed form.
    */
  val q243TarShard: QueryDef = QueryDef(
    "q243_tar_shard",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.TarProbe
        val ns = 1 + r.n % 4
        val members = (0 until ns).flatMap { j =>
          val text = Array.fill(15 + (r.n + j) % 30)(
            ('a' + (r.v + j) % 26).toByte)
          val cls = ((r.v + j) % 10).toString.getBytes("ISO-8859-1")
          Seq((s"shard/s$j.txt", text), (s"shard/s$j.cls", cls))
        }
        val dirs = if (r.n % 3 == 0) Seq("shard/") else Nil
        val bytes = TarProbe.synth(members, dirs = dirs)
        val info = TarProbe.probe(bytes)
          .getOrElse(sys.error(s"synthesized tar failed to probe: doc ${r.doc_id}"))
        val files = info.members.filter(_.typeflag == '0')
        val firstTxt = files.find(_.name.endsWith(".txt")).get
        val firstCls = files.find(_.name.endsWith(".cls")).get
        (r.doc_id, info.nMembers, files.length,
          info.members.count(_.typeflag == '5'), info.nSamples,
          info.totalSize, info.members.map(_.name).mkString(","),
          new String(TarProbe.content(bytes, firstTxt), "ISO-8859-1"),
          new String(TarProbe.content(bytes, firstCls), "ISO-8859-1"),
          info.members.map(_.mtime).max, bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_members", "n_files", "n_dirs", "n_samples",
          "total_size", "names", "first_text", "first_cls", "mtime",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   1 + n % 4 AS ns,
                   CASE WHEN n % 3 = 0 THEN 1 ELSE 0 END AS hasdir
            FROM d),
      t AS (SELECT *,
                   list_transform(range(ns), j -> 15 + (n + j) % 30) AS tlens,
                   list_transform(range(ns), j ->
                     'shard/s' || CAST(j AS VARCHAR) || '.txt,' ||
                     'shard/s' || CAST(j AS VARCHAR) || '.cls') AS name_pairs
            FROM g)
      SELECT doc_id,
             CAST(2 * ns + hasdir AS INTEGER) AS n_members,
             CAST(2 * ns AS INTEGER) AS n_files,
             CAST(hasdir AS INTEGER) AS n_dirs,
             CAST(ns AS INTEGER) AS n_samples,
             CAST(list_sum(tlens) + ns AS BIGINT) AS total_size,
             CASE WHEN hasdir = 1 THEN 'shard/,' ELSE '' END ||
               array_to_string(name_pairs, ',') AS names,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), 15 + n % 30)
               AS first_text,
             CAST(v % 10 AS VARCHAR) AS first_cls,
             CAST(1577836800 AS BIGINT) AS mtime,
             CAST(hasdir * 512 + ns * 2048 + 1024 AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** SRT + WEBVTT SUBTITLE PARSE under the oracle gate — the transcript
    * layer that pairs a video lake's payloads with text: per document,
    * deterministic cues are rendered to REAL SubRip text and REAL
    * WebVTT text (comma vs dot milliseconds, VTT identifier lines),
    * both parsed back ([[graft.operators.Subtitles]]: strict timestamp
    * decode, monotonic SRT indices, end > start), cross-checked cue
    * for cue, and reduced to the timing summary — cue counts, total
    * caption time, span, the largest inter-cue gap, first/last cue
    * text (multi-line cues keep their embedded newline). The oracle
    * rebuilds every number and string in closed form.
    */
  val q244Subtitles: QueryDef = QueryDef(
    "q244_subtitles",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.Subtitles
        val k = 2 + r.n % 4
        val cues = (0 until k).map { i =>
          val start = i * 3000L + r.v % 500
          val end = start + 1000 + (r.n + i) % 2000
          val lines = Vector(s"line ${('a' + (r.v + i) % 26).toChar}") ++
            (if (i % 2 == 0) Vector(s"and ${('a' + (r.n + i) % 26).toChar}")
            else Vector.empty)
          Subtitles.Cue(i + 1, start, end, lines)
        }
        val srt = Subtitles.parseSrt(Subtitles.renderSrt(cues))
          .getOrElse(sys.error(s"srt failed to parse: doc ${r.doc_id}"))
        val vtt = Subtitles.parseVtt(Subtitles.renderVtt(cues))
          .getOrElse(sys.error(s"vtt failed to parse: doc ${r.doc_id}"))
        require(srt.map(c => (c.startMs, c.endMs, c.text)) ==
          vtt.map(c => (c.startMs, c.endMs, c.text)),
          s"srt/vtt cue disagreement: doc ${r.doc_id}")
        val gaps = srt.sliding(2).collect {
          case Seq(a, b) => b.startMs - a.endMs
        }.toVector
        (r.doc_id, srt.length, srt.map(_.durationMs).sum,
          srt.last.endMs - srt.head.startMs,
          if (gaps.isEmpty) 0L else gaps.max,
          srt.map(_.durationMs).min, srt.map(_.durationMs).max,
          srt.head.text, srt.last.text,
          srt.count(_.lines.length == 2))
      }
      probed.toDF("doc_id", "n_cues", "total_cue_ms", "span_ms",
          "max_gap_ms", "min_dur_ms", "max_dur_ms", "first_text",
          "last_text", "n_two_line")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 2 + n % 4 AS k FROM d),
      t AS (SELECT *,
                   list_transform(range(k), i ->
                     1000 + (n + i) % 2000) AS durs,
                   list_transform(range(k - 1), i ->
                     2000 - (n + i) % 2000) AS gaps
            FROM g)
      SELECT doc_id,
             CAST(k AS INTEGER) AS n_cues,
             CAST(list_sum(durs) AS BIGINT) AS total_cue_ms,
             CAST((k - 1) * 3000 + 1000 + (n + k - 1) % 2000 AS BIGINT)
               AS span_ms,
             CAST(list_max(gaps) AS BIGINT) AS max_gap_ms,
             CAST(list_min(durs) AS BIGINT) AS min_dur_ms,
             CAST(list_max(durs) AS BIGINT) AS max_dur_ms,
             'line ' || chr(CAST(97 + v % 26 AS INTEGER)) || chr(10) ||
               'and ' || chr(CAST(97 + n % 26 AS INTEGER)) AS first_text,
             CASE WHEN (k - 1) % 2 = 0
                  THEN 'line ' || chr(CAST(97 + (v + k - 1) % 26 AS INTEGER))
                       || chr(10) ||
                       'and ' || chr(CAST(97 + (n + k - 1) % 26 AS INTEGER))
                  ELSE 'line ' || chr(CAST(97 + (v + k - 1) % 26 AS INTEGER))
             END AS last_text,
             CAST((k + 1) // 2 AS INTEGER) AS n_two_line
      FROM t ORDER BY doc_id"""))

  /** WEBDATASET INGEST CHAIN under the oracle gate — the full path a
    * multimodal training pipeline runs, composed from the engine's own
    * operators: per document a REAL tar shard of (s{j}.wav, s{j}.txt)
    * sample pairs is walked ([[graft.operators.TarProbe]], checksums
    * verified), each member's bytes are EXTRACTED, the wav payloads go
    * through the REAL decode chain
    * ([[graft.operators.Multimodal.realDecode]]: RIFF walk, PCM16
    * samples) and the captions through UTF-8 — shard → members →
    * samples → features in one pass, exactly the
    * shard-read-decode-pair step a WebDataset loader performs. The
    * oracle recomputes the PCM statistics from the same closed-form
    * sample schedule (q216/q219 protocol) plus the caption strings and
    * the 512-block shard geometry — a slip anywhere in the chain
    * (tar offsets, RIFF parse, sample order) lands in the hash.
    */
  val q245WebdatasetIngest: QueryDef = QueryDef(
    "q245_webdataset_ingest",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.{MediaCodecs, Multimodal, TarProbe}
        val ns = 1 + r.n % 3
        val members = (0 until ns).flatMap { j =>
          val samples = Array.tabulate(17)(i =>
            ((r.v * 31 + j * 53 + i * 97) % 8192 - 4096).toShort)
          val caption = ('a' + (r.v + j) % 26).toChar.toString * (12 + (r.n + j) % 20)
          Seq((s"s$j.wav", MediaCodecs.encodeWavPcm16(8000, samples)),
            (s"s$j.txt", caption.getBytes("ISO-8859-1")))
        }
        val shard = TarProbe.synth(members)
        val info = TarProbe.probe(shard)
          .getOrElse(sys.error(s"shard failed to probe: doc ${r.doc_id}"))
        val wavs = info.members.filter(_.name.endsWith(".wav"))
        val txts = info.members.filter(_.name.endsWith(".txt"))
        val decoded = wavs.map { m =>
          Multimodal.realDecode(TarProbe.content(shard, m))
            .getOrElse(sys.error(s"wav member failed decode: doc ${r.doc_id}"))
        }
        require(decoded.forall { case (w, h, c, f) =>
          w == 17 && h == 1 && c == 1 && f(0) == 8000f
        }, s"unexpected wav shape: doc ${r.doc_id}")
        val captions = txts.map(m =>
          new String(TarProbe.content(shard, m), "ISO-8859-1"))
        (r.doc_id, info.nMembers, info.nSamples,
          decoded.map(_._4(1).toLong).sum, // sum of first samples
          decoded.map(_._4(2).toLong).sum, // sum of sample sums
          decoded.map(_._4(3).toLong).sum, // sum of weighted sums
          captions.head, captions.map(_.length.toLong).sum,
          info.totalSize, shard.length.toLong)
      }
      probed.toDF("doc_id", "n_members", "n_samples", "sum_first",
          "sum_samples", "sum_weighted", "first_caption", "caption_chars",
          "total_size", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 1 + n % 3 AS ns FROM d),
      t AS (SELECT *,
                   list_transform(range(ns), j ->
                     (v * 31 + j * 53) % 8192 - 4096) AS firsts,
                   list_transform(range(ns), j ->
                     list_sum(list_transform(range(17), i ->
                       (v * 31 + j * 53 + i * 97) % 8192 - 4096))) AS sums,
                   list_transform(range(ns), j ->
                     list_sum(list_transform(range(17), i ->
                       (i + 1) * ((v * 31 + j * 53 + i * 97) % 8192 - 4096))))
                     AS wsums,
                   list_transform(range(ns), j -> 12 + (n + j) % 20) AS clens
            FROM g)
      SELECT doc_id,
             CAST(2 * ns AS INTEGER) AS n_members,
             CAST(ns AS INTEGER) AS n_samples,
             CAST(list_sum(firsts) AS BIGINT) AS sum_first,
             CAST(list_sum(sums) AS BIGINT) AS sum_samples,
             CAST(list_sum(wsums) AS BIGINT) AS sum_weighted,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), 12 + n % 20)
               AS first_caption,
             CAST(list_sum(clens) AS BIGINT) AS caption_chars,
             CAST(ns * 78 + list_sum(clens) AS BIGINT) AS total_size,
             CAST(ns * 2048 + 1024 AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q234Id3Tags, q235Mp4Edits, q236MkvProbe, q237ZipProbe, q238FlacProbe,
      q239OggProbe, q240UnifiedProbe, q241WarcWalk, q242WarcGz, q243TarShard,
      q244Subtitles, q245WebdatasetIngest)
}
