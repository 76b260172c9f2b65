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

  val all: Seq[QueryDef] = Seq(q226Mp4Probe)
}
