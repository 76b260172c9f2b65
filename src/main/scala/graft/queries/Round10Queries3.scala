package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 surface, third tranche: the long-form container corners a
  * petabyte shard lake actually hits — PAX/GNU tar names past 100
  * bytes, the remaining ID3 generation, MP4 sync-sample/64-bit chunk
  * tables — each under the q218 synth→probe→closed-form-oracle
  * protocol.
  */
object Round10Queries3 {

  /** TAR LONG-FORM NAMES under the oracle gate — the two mechanisms
    * real archives use once paths pass the ustar 100-byte field:
    * per document, synthesize a VALID archive mixing one plain member,
    * one PAX member ([[graft.operators.TarProbe.synthLongForm]]: a
    * typeflag-'x' header whose data is self-sized `"LEN key=value\n"`
    * records where LEN counts its OWN digits — `path` + 10-digit
    * `mtime` + on even hashes a `size` record with the member's octal
    * field zeroed, the >8 GiB wire form), and one GNU long-name member
    * (typeflag 'L', NUL-terminated name data), then REALLY walk it
    * ([[graft.operators.TarProbe.probe]]: checksums, record tiling,
    * override application) and emit the summary. The ~500-byte PAX
    * paths are sized so the record total straddles the 512-byte block
    * boundary — the oracle recomputes every self-referential LEN in
    * closed form, so an off-by-one in the length arithmetic moves the
    * block count and lands in `file_bytes`.
    */
  val q246TarLongNames: QueryDef = QueryDef(
    "q246_tar_long_names",
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
        import graft.operators.TarProbe.SynthEntry
        val c0 = 10 + r.n % 15
        val c1 = 5 + r.v % 9
        val c2 = 20 + (r.n + r.v) % 25
        val paxLen = 480 + r.n % 40
        val gnuLen = 90 + r.v % 30
        val sizeRec = r.v % 2 == 0
        val paxName = "d" * paxLen
        val gnuName = "g" * gnuLen
        val bytes = TarProbe.synthLongForm(Seq(
          SynthEntry("plain.txt",
            Array.fill(c0)(('a' + r.n % 26).toByte)),
          SynthEntry(paxName,
            Array.fill(c1)(('a' + r.v % 26).toByte), mech = 'x',
            paxMtime = 1700000000L + r.v, paxSizeRecord = sizeRec),
          SynthEntry(gnuName,
            Array.fill(c2)(('a' + (r.n + r.v) % 26).toByte), mech = 'L')))
        val info = TarProbe.probe(bytes)
          .getOrElse(sys.error(s"long-form tar failed to probe: doc ${r.doc_id}"))
        require(info.members.map(_.via) == Vector("ustar", "pax", "gnuL"),
          s"mechanism order broke: doc ${r.doc_id}")
        val pax = info.members(1)
        val gnu = info.members(2)
        require(pax.name == paxName && gnu.name == gnuName,
          s"override name mismatch: doc ${r.doc_id}")
        (r.doc_id, info.nMembers, pax.name.length, pax.mtime,
          new String(TarProbe.content(bytes, pax), "ISO-8859-1"),
          gnu.name, pax.nPaxRecords, info.totalSize,
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_members", "pax_name_len", "pax_mtime",
          "pax_text", "gnu_name", "n_pax_records", "total_size",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   10 + n % 15 AS c0,
                   5 + v % 9 AS c1,
                   20 + (n + v) % 25 AS c2,
                   480 + n % 40 AS pax_len,
                   90 + v % 30 AS gnu_len,
                   CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS sizerec
            FROM d),
      -- self-referential record lengths: path LEN = (len+7)+3 digits,
      -- mtime LEN = 18+2, size LEN = 9 for 1-digit sizes else 11
      t AS (SELECT *,
                   (pax_len + 10) + 20 +
                     sizerec * (CASE WHEN c1 < 10 THEN 9 ELSE 11 END)
                     AS paxdata
            FROM g)
      SELECT doc_id,
             CAST(3 AS INTEGER) AS n_members,
             CAST(pax_len AS INTEGER) AS pax_name_len,
             CAST(1700000000 + v AS BIGINT) AS pax_mtime,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), c1) AS pax_text,
             repeat('g', gnu_len) AS gnu_name,
             CAST(2 + sizerec AS INTEGER) AS n_pax_records,
             CAST(c0 + c1 + c2 AS BIGINT) AS total_size,
             CAST(5632 + ((paxdata + 511) // 512) * 512 AS BIGINT)
               AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** ID3v2.2 TAG DECODE under the oracle gate — the remaining ID3
    * generation after q234's v2.3/v2.4 (the old iTunes-era form a
    * legacy MP3 corpus is full of): per document, synthesize a VALID
    * v2.2 tag ([[graft.operators.Id3.synthTag]]: 3-character frame ids
    * TT2/TP1/TAL/TYE/TRK, 3-byte big-endian frame sizes, NO flags
    * bytes — a 6-byte frame header — ISO-8859-1 or BOM'd UCS-2 text,
    * an occasional PIC binary frame, zero padding) followed by a VALID
    * multi-frame MPEG-1 stream, then REALLY parse both layers
    * ([[graft.operators.Id3.parse]] dispatching on the major version,
    * [[graft.operators.MpegFrames.probe]] skipping the tag via its
    * syncsafe size) with the two parsers' tag spans cross-checked row
    * by row. The oracle recomputes every string and size in closed
    * form — frame = 7 bytes + payload (UCS-2 = BOM + 2/char), so a
    * parser still charging v2.3's 10-byte header drifts 3 bytes per
    * frame and lands in the hash.
    */
  val q247Id3v22: QueryDef = QueryDef(
    "q247_id3v22_tags",
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
        val enc = r.v % 2
        val title = "t" + ('a' + r.v % 26).toChar.toString * (1 + r.v % 7)
        val artist = "a" + ('a' + (r.n + r.v) % 26).toChar.toString
        val album = "b" + ('a' + r.n % 26).toChar.toString * (1 + r.n % 5)
        val year = (1950 + r.n % 70).toString
        val track = (1 + r.v % 20).toString
        val bin =
          if (r.v % 5 == 0)
            Seq(("PIC", Array.tabulate(1 + (r.n + r.v) % 8)(i =>
              ((i * 37 + r.n) % 251).toByte)))
          else Nil
        val tagBytes = Id3.synthTag(2,
          Seq(("TT2", title, enc), ("TP1", artist, enc),
            ("TAL", album, enc), ("TYE", year, enc), ("TRK", track, enc)),
          padding = r.n % 29, binFrames = bin)
        val layer = 1 + r.n % 3
        val srIdx = r.v % 3
        val k = 2 + r.n % 3
        val frames = (0 until k).map(j => (1 + (r.n + j) % 14, (r.v + j) % 2 == 0))
        val bytes = tagBytes ++ MpegFrames.synthStream(
          layer, srIdx, frames, (fi, j) => (fi * 13 + j * 5) % 251)
        val info = MpegFrames.probe(bytes)
          .getOrElse(sys.error(s"stream failed to probe: doc ${r.doc_id}"))
        val tag = Id3.parse(bytes)
          .getOrElse(sys.error(s"tag failed to parse: doc ${r.doc_id}"))
        require(info.id3v2Bytes == tag.tagBytes,
          s"tag-span disagreement on doc ${r.doc_id}: " +
            s"${info.id3v2Bytes} vs ${tag.tagBytes}")
        (r.doc_id, tag.major, tag.tagBytes.toLong, tag.nFrames,
          tag.frames.head.encoding, tag.text("TT2").orNull,
          tag.text("TP1").orNull, tag.text("TAL").orNull,
          tag.text("TYE").orNull, tag.text("TRK").orNull,
          tag.frames.exists(_.id == "PIC"), tag.paddingBytes,
          info.nFrames, info.durationMs, bytes.length.toLong)
      }
      probed.toDF("doc_id", "major", "tag_bytes", "n_id3_frames", "enc",
          "title", "artist", "album", "year_txt", "track_txt", "has_pic",
          "padding", "n_mpeg_frames", "duration_ms", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   v % 2 AS enc,
                   2 + v % 7 AS len_t,
                   2 AS len_a,
                   2 + n % 5 AS len_b,
                   4 AS len_y,
                   CAST(len(CAST(1 + v % 20 AS VARCHAR)) AS INTEGER) AS len_k,
                   CASE WHEN v % 5 = 0 THEN 6 + 1 + (n + v) % 8 ELSE 0 END AS pic,
                   n % 29 AS pad,
                   CAST(1 + n % 3 AS INTEGER) AS layer,
                   [44100, 48000, 32000][v % 3 + 1] AS sr,
                   2 + n % 3 AS k
            FROM d),
      t AS (SELECT *,
                   7 + (CASE WHEN enc = 1 THEN 2 + 2 * len_t ELSE len_t END)
                 + 7 + (CASE WHEN enc = 1 THEN 2 + 2 * len_a ELSE len_a END)
                 + 7 + (CASE WHEN enc = 1 THEN 2 + 2 * len_b ELSE len_b END)
                 + 7 + (CASE WHEN enc = 1 THEN 2 + 2 * len_y ELSE len_y END)
                 + 7 + (CASE WHEN enc = 1 THEN 2 + 2 * len_k ELSE len_k END)
                 + pic + pad AS tag_body,
                   CASE WHEN layer = 1 THEN 384 ELSE 1152 END AS spf,
                   list_transform(range(k), j ->
                     [[32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
                      [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
                      [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
                     ][layer][(n + j) % 14 + 1]) AS kbps,
                   list_transform(range(k), j ->
                     CASE WHEN (v + j) % 2 = 0 THEN 1 ELSE 0 END) AS pads
            FROM g)
      SELECT doc_id,
             CAST(2 AS INTEGER) AS major,
             CAST(10 + tag_body AS BIGINT) AS tag_bytes,
             CAST(5 + (CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_id3_frames,
             CAST(enc AS INTEGER) AS enc,
             't' || repeat(chr(CAST(97 + v % 26 AS INTEGER)), 1 + v % 7) AS title,
             'a' || chr(CAST(97 + (n + v) % 26 AS INTEGER)) AS artist,
             'b' || repeat(chr(CAST(97 + n % 26 AS INTEGER)), 1 + n % 5) AS album,
             CAST(1950 + n % 70 AS VARCHAR) AS year_txt,
             CAST(1 + v % 20 AS VARCHAR) AS track_txt,
             v % 5 = 0 AS has_pic,
             CAST(pad AS INTEGER) AS padding,
             CAST(k AS INTEGER) AS n_mpeg_frames,
             CAST(CAST(k AS BIGINT) * spf * 1000 // sr AS BIGINT) AS duration_ms,
             CAST(10 + tag_body + list_sum(list_transform(range(k), j ->
               CASE WHEN layer = 1
                    THEN (12000 * kbps[j + 1] // sr + pads[j + 1]) * 4
                    ELSE 144000 * kbps[j + 1] // sr + pads[j + 1] END))
               AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** MP4 SYNC-SAMPLE + 64-BIT CHUNK-OFFSET TABLES under the oracle
    * gate — the two stbl members q229 left out: per document,
    * synthesize a VALID MP4 whose video track carries an stss
    * keyframe table (every g-th sample plus a final stray, the GOP
    * structure a video pipeline splits on) and — on even hashes — a
    * co64 64-bit chunk-offset table whose offsets sit ABOVE 2^32
    * (the >4 GiB file form; stco below it), then REALLY parse it
    * ([[graft.operators.Mp4Boxes.probe]]: exact entry tiling, strict
    * monotonicity and sample-count bounds on sync numbers, stco/co64
    * mutual exclusion) and emit the keyframe statistics and the exact
    * offset sum — a parser reading co64 entries as 32-bit drops
    * 5·2^32 per chunk and lands in the hash. The oracle recomputes
    * every count, gap, offset sum, and the full file byte layout in
    * closed form.
    */
  val q248Mp4SyncCo64: QueryDef = QueryDef(
    "q248_mp4_sync_co64",
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
        import graft.operators.Mp4Boxes.SynthTrack
        val ns = 20 + r.n % 30
        val delta = 100 + r.v % 50
        val usz = 50 + r.v % 100
        val c = 2 + r.n % 5
        val co64 = r.v % 2 == 0
        val g = 2 + r.v % 5
        val m = (ns - 1) / g
        val lastReg = 1 + m * g
        val syncs = (0 to m).map(i => 1L + i * g) ++
          (if (lastReg != ns) Seq(ns.toLong) else Nil)
        val mdatLen = 16 + r.n % 17
        val vt = SynthTrack(1, "vide", "avc1", 640, 360, 600,
          ns.toLong * delta, "eng",
          sttsEntries = Seq((ns.toLong, delta.toLong)),
          sizes = Some(Left(usz.toLong)), chunks = c,
          useCo64 = co64, syncSamples = syncs)
        val bytes = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600,
          ns.toLong * delta, Seq(vt), mdatLen, i => (i * 11 + 3) % 251)
        val info = Mp4Boxes.probe(bytes)
          .getOrElse(sys.error(s"mp4 failed to probe: doc ${r.doc_id}"))
        val st = info.tracks.head.samples
          .getOrElse(sys.error(s"no sample tables: doc ${r.doc_id}"))
        val sy = st.sync
          .getOrElse(sys.error(s"no sync table: doc ${r.doc_id}"))
        (r.doc_id, st.sampleCount, st.chunkCount, st.co64,
          st.chunkOffsetSum, sy.count, sy.first, sy.last, sy.maxGap,
          st.sttsDuration, st.totalSampleBytes, info.mdatBytes,
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_samples", "n_chunks", "is_co64",
          "chunk_off_sum", "n_sync", "first_sync", "last_sync", "max_gap",
          "stts_ticks", "sample_bytes", "mdat_bytes", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   20 + n % 30 AS ns,
                   100 + v % 50 AS delta,
                   50 + v % 100 AS usz,
                   2 + n % 5 AS c,
                   CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS co64,
                   2 + v % 5 AS gap,
                   16 + n % 17 AS mdatlen
            FROM d),
      t AS (SELECT *,
                   (ns - 1) // gap AS m,
                   CASE WHEN 1 + ((ns - 1) // gap) * gap <> ns
                        THEN 1 ELSE 0 END AS extra
            FROM g),
      u AS (SELECT *,
                   m + 1 + extra AS nsync,
                   CASE WHEN co64 = 1 THEN 8 ELSE 4 END AS offw
            FROM t)
      SELECT doc_id,
             CAST(ns AS BIGINT) AS n_samples,
             CAST(c AS BIGINT) AS n_chunks,
             co64 = 1 AS is_co64,
             CAST(c * 1000 + 16 * c * (c - 1) // 2
                  + co64 * c * 21474836480 AS BIGINT) AS chunk_off_sum,
             CAST(nsync AS BIGINT) AS n_sync,
             CAST(1 AS BIGINT) AS first_sync,
             CAST(CASE WHEN extra = 1 THEN ns ELSE 1 + m * gap END AS BIGINT)
               AS last_sync,
             CAST(gap AS BIGINT) AS max_gap,
             CAST(CAST(ns AS BIGINT) * delta AS BIGINT) AS stts_ticks,
             CAST(CAST(ns AS BIGINT) * usz AS BIGINT) AS sample_bytes,
             CAST(mdatlen AS BIGINT) AS mdat_bytes,
             CAST(20 + 8 + 108
                  + 221 + 24 + 20 + (16 + offw * c) + (16 + 4 * nsync)
                  + 8 + mdatlen AS BIGINT) AS file_bytes
      FROM u ORDER BY doc_id"""))

  /** FLAC SEEKTABLE + PICTURE DECODE under the oracle gate — the two
    * metadata blocks q238 walked structurally: per document, synthesize
    * a VALID FLAC whose seektable carries real 18-byte points with
    * 64-bit offsets ABOVE 2^32 plus trailing all-ones placeholder
    * points, and (on even hashes) a PICTURE block whose every length
    * is BIG-endian — next to the little-endian vorbis comment, the
    * exact endianness trap — then REALLY parse it
    * ([[graft.operators.FlacProbe.probe]]: strict point ascent,
    * placeholder ordering, exact block tiling) and emit the seek
    * statistics and cover-art metadata. The oracle recomputes the
    * offset sum (a 32-bit misread drops i·2^32 per point), every
    * string, and the full block-by-block byte layout in closed form.
    */
  val q249FlacSeekPicture: QueryDef = QueryDef(
    "q249_flac_seek_picture",
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
        val k = 2 + r.n % 5
        val ph = r.v % 3
        val stride = 44100L * (1 + r.v % 3)
        val pts = (0 until k).map(i =>
          (i * stride, (i.toLong << 32) + i * 1000L + r.v, 4096))
        val hasPic = r.v % 2 == 0
        val mime = if (r.n % 2 == 0) "image/png" else "image/jpeg"
        val desc = "c" * (1 + r.n % 10)
        val dataLen = 30 + (r.n + r.v) % 60
        val pic =
          if (hasPic)
            Some((r.v % 21, mime, desc, 100L + r.n, 50L + r.v, 24L, 0L, dataLen))
          else None
        val wc = r.n % 3 != 2
        val title = "t" * (1 + r.v % 6)
        val frameLen = 40 + r.n % 100
        val bytes = FlacProbe.synth(1152, 4096, 200, 2000, 44100, 2, 16,
          441000L, "gv", Seq(("TITLE", title)), wc, -1, frameLen,
          i => i * 7 + r.n, seekPoints = pts, seekPlaceholders = ph,
          picture = pic)
        val info = FlacProbe.probe(bytes)
          .getOrElse(sys.error(s"flac failed to probe: doc ${r.doc_id}"))
        val sk = info.seek
          .getOrElse(sys.error(s"no seektable: doc ${r.doc_id}"))
        (r.doc_id, sk.nPoints, sk.nPlaceholders, sk.firstSample,
          sk.lastSample, sk.offsetSum,
          info.picture.map(_.picType), info.picture.map(_.mime).orNull,
          info.picture.map(_.description).orNull,
          info.picture.map(_.width), info.picture.map(_.height),
          info.picture.map(_.dataBytes), info.nPictures,
          if (wc) info.tag("TITLE").orNull else null,
          info.nBlocks, bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_seek", "n_placeholders", "first_sample",
          "last_sample", "offset_sum", "pic_type", "pic_mime", "pic_desc",
          "pic_w", "pic_h", "pic_data_bytes", "n_pictures", "title",
          "n_blocks", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + n % 5 AS k,
                   v % 3 AS ph,
                   44100 * (1 + v % 3) AS stride,
                   CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS haspic,
                   CASE WHEN n % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
                   1 + n % 10 AS dlen,
                   30 + (n + v) % 60 AS datalen,
                   CASE WHEN n % 3 != 2 THEN 1 ELSE 0 END AS wc,
                   1 + v % 6 AS tlen,
                   40 + n % 100 AS flen
            FROM d),
      t AS (SELECT *,
                   CASE WHEN haspic = 1 THEN
                     4 + 4 + 4 + (CASE WHEN n % 2 = 0 THEN 9 ELSE 10 END)
                       + 4 + dlen + 16 + 4 + datalen
                   ELSE 0 END AS picblock,
                   CASE WHEN wc = 1 THEN 4 + 4 + 2 + 4 + (4 + 6 + tlen)
                        ELSE 0 END AS cblock
            FROM g)
      SELECT doc_id,
             CAST(k AS INTEGER) AS n_seek,
             CAST(ph AS INTEGER) AS n_placeholders,
             CAST(0 AS BIGINT) AS first_sample,
             CAST(CAST(k - 1 AS BIGINT) * stride AS BIGINT) AS last_sample,
             CAST((4294967296 + 1000) * (CAST(k AS BIGINT) * (k - 1) // 2)
                  + CAST(k AS BIGINT) * v AS BIGINT) AS offset_sum,
             CAST(CASE WHEN haspic = 1 THEN v % 21 END AS INTEGER) AS pic_type,
             CASE WHEN haspic = 1 THEN mime END AS pic_mime,
             CASE WHEN haspic = 1 THEN repeat('c', dlen) END AS pic_desc,
             CAST(CASE WHEN haspic = 1 THEN 100 + n END AS BIGINT) AS pic_w,
             CAST(CASE WHEN haspic = 1 THEN 50 + v END AS BIGINT) AS pic_h,
             CAST(CASE WHEN haspic = 1 THEN datalen END AS BIGINT)
               AS pic_data_bytes,
             CAST(haspic AS INTEGER) AS n_pictures,
             CASE WHEN wc = 1 THEN repeat('t', tlen) END AS title,
             CAST(2 + haspic + wc AS INTEGER) AS n_blocks,
             CAST(4 + 38 + (4 + 18 * (k + ph)) + picblock + cblock + flen
               AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** OGG CONCURRENT MULTIPLEXING under the oracle gate — the
    * multi-serial physical streams q239's single-stream prober
    * deliberately rejects (an A/V .ogv is exactly this shape): per
    * document, synthesize a VALID RFC 3533 §4 multiplexed file
    * ([[graft.operators.OggProbe.synthMux]]: both BOS pages first, the
    * two logical streams' data pages round-robin interleaved,
    * per-serial sequence numbers, EOS per stream, true Ogg CRCs), then
    * REALLY demux it ([[graft.operators.OggProbe.probeMux]]: per-page
    * CRC verification, per-serial sequencing, codec identification)
    * and emit both streams' accounts — an opus stream at the fixed
    * 48 kHz granule rate beside a vorbis stream at its own sample
    * rate, so granule attribution errors between the interleaved
    * serials land in either duration. The oracle recomputes every
    * count, byte total, granule, and the interleaved page-by-page file
    * size in closed form.
    */
  val q250OggMux: QueryDef = QueryDef(
    "q250_ogg_mux",
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
        import graft.operators.OggProbe.SynthPage
        val ka = 2 + r.n % 3
        val kb = 2 + r.v % 3
        val aSerial = 100L + r.v
        val bSerial = 500L + r.n
        val aPages = (0 until ka).map(i =>
          SynthPage((i + 1) * 960L, Seq(40 + (r.n + i) % 20)))
        val bPages = (0 until kb).map(i =>
          SynthPage((i + 1) * 44100L, Seq(60 + (r.v + i) % 25)))
        val bytes = OggProbe.synthMux(Seq(
          (aSerial, OggProbe.opusHead(1 + r.n % 2, 312, 48000L), aPages),
          (bSerial, OggProbe.vorbisHead(1 + r.v % 2, 44100L), bPages)),
          (p, k) => p * 7 + k + r.v)
        require(OggProbe.probe(bytes).isEmpty,
          s"single-stream probe must reject mux: doc ${r.doc_id}")
        val streams = OggProbe.probeMux(bytes)
          .getOrElse(sys.error(s"mux failed to demux: doc ${r.doc_id}"))
        require(streams.size == 2, s"expected 2 streams: doc ${r.doc_id}")
        val a = streams(0); val b = streams(1)
        (r.doc_id, streams.size, a.serial, a.codec.name, a.codec.channels,
          a.nPages, a.nPackets, a.bodyBytes, a.finalGranule, a.durationMs,
          b.serial, b.codec.name, b.codec.channels, b.nPages, b.nPackets,
          b.bodyBytes, b.finalGranule, b.durationMs, bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_streams", "a_serial", "a_codec", "a_chan",
          "a_pages", "a_packets", "a_body", "a_granule", "a_dur_ms",
          "b_serial", "b_codec", "b_chan", "b_pages", "b_packets",
          "b_body", "b_granule", "b_dur_ms", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + n % 3 AS ka,
                   2 + v % 3 AS kb
            FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(ka), i ->
                     40 + (n + i) % 20)) AS abody,
                   list_sum(list_transform(range(kb), i ->
                     60 + (v + i) % 25)) AS bbody
            FROM g)
      SELECT doc_id,
             CAST(2 AS INTEGER) AS n_streams,
             CAST(100 + v AS BIGINT) AS a_serial,
             'opus' AS a_codec,
             CAST(1 + n % 2 AS INTEGER) AS a_chan,
             CAST(1 + ka AS INTEGER) AS a_pages,
             CAST(1 + ka AS BIGINT) AS a_packets,
             CAST(19 + abody AS BIGINT) AS a_body,
             CAST(ka * 960 AS BIGINT) AS a_granule,
             CAST((ka * 960 - 312) * 1000 // 48000 AS BIGINT) AS a_dur_ms,
             CAST(500 + n AS BIGINT) AS b_serial,
             'vorbis' AS b_codec,
             CAST(1 + v % 2 AS INTEGER) AS b_chan,
             CAST(1 + kb AS INTEGER) AS b_pages,
             CAST(1 + kb AS BIGINT) AS b_packets,
             CAST(30 + bbody AS BIGINT) AS b_body,
             CAST(kb * 44100 AS BIGINT) AS b_granule,
             CAST(kb * 1000 AS BIGINT) AS b_dur_ms,
             CAST((28 + 19) + (28 + 30)
                  + 28 * ka + abody + 28 * kb + bbody AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** WEBVTT DOCUMENT MODEL under the oracle gate — the non-cue surface
    * q244's cue walk skipped: per document, render a VALID rich WebVTT
    * file ([[graft.operators.Subtitles.renderVttRich]]: an optional
    * REGION block, an optional STYLE block with real CSS lines, NOTE
    * comments before and between cues, per-cue settings after the end
    * timestamp), then REALLY parse it
    * ([[graft.operators.Subtitles.parseVttDoc]]: the spec's placement
    * rule — STYLE/REGION only before the first cue — and the
    * no-arrow-in-comments rule enforced) and emit the document
    * accounting: block counts, the reassembled CSS text, which cues
    * carry settings, and the timing summary. The oracle rebuilds every
    * count and string in closed form.
    */
  val q251VttDocModel: QueryDef = QueryDef(
    "q251_vtt_doc_model",
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
          val settings =
            if (i % 2 == 0)
              "align:" + Seq("start", "center", "end")((r.v + i) % 3)
            else ""
          Subtitles.Cue(i + 1, start, end,
            Vector("line " + ('a' + (r.v + i) % 26).toChar), settings)
        }
        val styleLines =
          if (r.n % 2 == 0)
            Seq("::cue {", s"  size: ${10 + r.v % 80}%;", "}")
          else Nil
        val regionLines =
          if (r.v % 4 == 0) Seq("id:r1", s"width:${30 + r.n % 70}%")
          else Nil
        val midNotes =
          if (r.n % 3 == 0) Map(0 -> "speaker change") else Map.empty[Int, String]
        val txt = Subtitles.renderVttRich(cues, regionLines, styleLines,
          Seq("machine transcript"), midNotes)
        val doc = Subtitles.parseVttDoc(txt)
          .getOrElse(sys.error(s"vtt failed to parse: doc ${r.doc_id}"))
        require(doc.cues.map(c => (c.startMs, c.endMs)) ==
          cues.map(c => (c.startMs, c.endMs)).toVector,
          s"cue timing drift: doc ${r.doc_id}")
        (r.doc_id, doc.cues.length, doc.nNotes, doc.nStyles, doc.nRegions,
          doc.styleText, doc.cues.head.settings,
          doc.cues.count(_.settings.nonEmpty),
          doc.cues.map(_.durationMs).sum, doc.cues.last.text,
          txt.length.toLong)
      }
      probed.toDF("doc_id", "n_cues", "n_notes", "n_styles", "n_regions",
          "style_text", "first_settings", "n_with_settings",
          "total_cue_ms", "last_text", "text_chars")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + n % 4 AS k,
                   CASE WHEN n % 2 = 0 THEN 1 ELSE 0 END AS hasstyle,
                   CASE WHEN v % 4 = 0 THEN 1 ELSE 0 END AS hasregion,
                   CASE WHEN n % 3 = 0 THEN 1 ELSE 0 END AS hasmid
            FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(k), i ->
                     1000 + (n + i) % 2000)) AS durs,
                   -- per-cue block: '\\ncN\\n' + time line + '\\n' + text + '\\n'
                   list_sum(list_transform(range(k), i ->
                     1 + 2 + 1 + 29 +
                     (CASE WHEN i % 2 = 0
                           THEN 1 + 6 + [5, 6, 3][(v + i) % 3 + 1]
                           ELSE 0 END) + 1 + 6 + 1)) AS cueblocks
            FROM g)
      SELECT doc_id,
             CAST(k AS INTEGER) AS n_cues,
             CAST(1 + hasmid AS INTEGER) AS n_notes,
             CAST(hasstyle AS INTEGER) AS n_styles,
             CAST(hasregion AS INTEGER) AS n_regions,
             CASE WHEN hasstyle = 1
                  THEN '::cue {' || chr(10) || '  size: '
                       || CAST(10 + v % 80 AS VARCHAR) || '%;' || chr(10) || '}'
                  ELSE '' END AS style_text,
             'align:' || ['start', 'center', 'end'][v % 3 + 1] AS first_settings,
             CAST((k + 1) // 2 AS INTEGER) AS n_with_settings,
             CAST(durs AS BIGINT) AS total_cue_ms,
             'line ' || chr(CAST(97 + (v + k - 1) % 26 AS INTEGER)) AS last_text,
             CAST(7 +
                  hasregion * (1 + 6 + 1 + 5 + 1 + 6 + 3 + 1) +
                  hasstyle * (1 + 5 + 1 + 7 + 1 + 12 + 1 + 1 + 1) +
                  (1 + 5 + 18 + 1) +
                  hasmid * (1 + 5 + 14 + 1) +
                  cueblocks AS BIGINT) AS text_chars
      FROM t ORDER BY doc_id"""))

  /** GOPHER-STYLE REPETITION FILTERS under the oracle gate — the
    * excess-repetition quality signals (most-frequent word/bigram/
    * trigram concentration, repeated-word fraction, distinct-token
    * ratio, all exact ×10⁶ ppm integers) that web-curation pipelines
    * cut boilerplate with, plus the pass/fail gate at fixed
    * thresholds. [[graft.operators.TextAnalysis.repetitionSignals]]
    * runs three explode→hash-aggregate passes re-joined on doc_id —
    * map-side partial aggregation, no window, no self-join. The oracle
    * recomputes every count and floor-division ratio from the same
    * tokenization.
    */
  val q252RepetitionSignals: QueryDef = QueryDef(
    "q252_repetition_signals",
    (s, dir) => {
      graft.operators.TextAnalysis
        .repetitionSignals(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS t FROM w0),
      wc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
      wagg AS (SELECT doc_id,
                      CAST(SUM(c) AS BIGINT) AS n_words,
                      MAX(c) AS top_word_c,
                      CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                        AS dup_word_c,
                      CAST(COUNT(*) AS BIGINT) AS distinct_words
               FROM wc GROUP BY 1),
      bg AS (SELECT doc_id, w[k] || ' ' || w[k + 1] AS g
             FROM w0, unnest(range(1, len(w))) u(k)),
      bagg AS (SELECT doc_id, MAX(c) AS top_bigram_c
               FROM (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
                     FROM bg GROUP BY 1, 2) GROUP BY 1),
      tg AS (SELECT doc_id, w[k] || ' ' || w[k + 1] || ' ' || w[k + 2] AS g
             FROM w0, unnest(range(1, len(w) - 1)) u(k)),
      tagg AS (SELECT doc_id, MAX(c) AS top_trigram_c
               FROM (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
                     FROM tg GROUP BY 1, 2) GROUP BY 1)
      SELECT doc_id, n_words, distinct_words, top_word_c, top_bigram_c,
             top_trigram_c, dup_word_c,
             top_word_c * 1000000 // n_words AS top_word_ppm,
             top_bigram_c * 1000000 // (n_words - 1) AS top_bigram_ppm,
             top_trigram_c * 1000000 // (n_words - 2) AS top_trigram_ppm,
             dup_word_c * 1000000 // n_words AS dup_word_ppm,
             distinct_words * 1000000 // n_words AS distinct_ppm,
             (top_word_c * 1000000 // n_words <= 300000
              AND top_bigram_c * 1000000 // (n_words - 1) <= 200000
              AND top_trigram_c * 1000000 // (n_words - 2) <= 150000
              AND dup_word_c * 1000000 // n_words <= 600000) AS gopher_pass
      FROM wagg JOIN bagg USING (doc_id) JOIN tagg USING (doc_id)
      ORDER BY doc_id"""))

  /** PARQUET FOOTER PROBE over the REAL lake files under the oracle
    * gate — unlike the synth-probe queries, this one walks the actual
    * testdata parquet files: [[graft.operators.ParquetFooter.probe]]
    * (a pure-JVM Thrift compact-protocol FileMetaData decode) runs
    * distributed over `binaryFile`-loaded table files and reports row
    * counts, row-group geometry, schema, codecs, and the key column's
    * min/max statistics — and every emitted number is independently
    * derivable by the oracle FROM THE DATA ITSELF (`count(*)`, the
    * key's `min`/`max`, the fixed schema), so the thrift walk, the
    * stat-byte endianness, and the INT32-vs-INT64 stat widths are all
    * checked against ground truth produced by a different writer
    * stack. Row-group count is the writer's 1 Mi-row default policy,
    * derived as `1 + (rows-1) // 1048576`.
    */
  val q253ParquetFooterProbe: QueryDef = QueryDef(
    "q253_parquet_footer",
    (s, dir) => {
      import s.implicits._
      val tables = Seq("customer", "documents", "nation", "region", "supplier")
      val files = tables.map { t =>
        s.read.format("binaryFile").load(s"$dir/$t.parquet")
          .select(lit(t).as("tbl"), col("content"))
      }.reduce(_ unionAll _).as[(String, Array[Byte])]
      val probed = files.map { case (t, bytes) =>
        import graft.operators.ParquetFooter
        val f = ParquetFooter.probe(bytes)
          .getOrElse(sys.error(s"footer probe failed: $t"))
        val key = f.firstGroupChunks.head
        (t, f.numRows, f.nRowGroups, f.columnNames.length,
          f.columnNames.mkString(","), f.codecName(key.codec),
          key.numValues,
          ParquetFooter.intStat(key.statMin
            .getOrElse(sys.error(s"no min stat: $t")))
            .getOrElse(sys.error(s"non-int key stat: $t")),
          ParquetFooter.intStat(key.statMax
            .getOrElse(sys.error(s"no max stat: $t")))
            .getOrElse(sys.error(s"non-int key stat: $t")),
          f.firstGroupChunks.map(_.nullCount).sum)
      }
      probed.toDF("tbl", "n_rows", "n_row_groups", "n_columns", "cols",
          "codec", "key_values", "key_min", "key_max", "null_sum")
        .orderBy("tbl")
    },
    Some("""
      SELECT * FROM (
        SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(1 + (count(*) - 1) // 1048576 AS INTEGER) AS n_row_groups,
               CAST(5 AS INTEGER) AS n_columns,
               'c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment' AS cols,
               'SNAPPY' AS codec,
               CAST(count(*) AS BIGINT) AS key_values,
               CAST(min(c_custkey) AS BIGINT) AS key_min,
               CAST(max(c_custkey) AS BIGINT) AS key_max,
               CAST(0 AS BIGINT) AS null_sum
        FROM customer
        UNION ALL
        SELECT 'documents', CAST(count(*) AS BIGINT),
               CAST(1 + (count(*) - 1) // 1048576 AS INTEGER),
               CAST(5 AS INTEGER),
               'doc_id,text,lang,source,n_chars', 'SNAPPY',
               CAST(count(*) AS BIGINT),
               CAST(min(doc_id) AS BIGINT), CAST(max(doc_id) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'nation', CAST(count(*) AS BIGINT),
               CAST(1 + (count(*) - 1) // 1048576 AS INTEGER),
               CAST(3 AS INTEGER),
               'n_nationkey,n_name,n_regionkey', 'SNAPPY',
               CAST(count(*) AS BIGINT),
               CAST(min(n_nationkey) AS BIGINT), CAST(max(n_nationkey) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM nation
        UNION ALL
        SELECT 'region', CAST(count(*) AS BIGINT),
               CAST(1 + (count(*) - 1) // 1048576 AS INTEGER),
               CAST(2 AS INTEGER),
               'r_regionkey,r_name', 'SNAPPY',
               CAST(count(*) AS BIGINT),
               CAST(min(r_regionkey) AS BIGINT), CAST(max(r_regionkey) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM region
        UNION ALL
        SELECT 'supplier', CAST(count(*) AS BIGINT),
               CAST(1 + (count(*) - 1) // 1048576 AS INTEGER),
               CAST(4 AS INTEGER),
               's_suppkey,s_name,s_nationkey,s_acctbal', 'SNAPPY',
               CAST(count(*) AS BIGINT),
               CAST(min(s_suppkey) AS BIGINT), CAST(max(s_suppkey) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM supplier
      ) ORDER BY tbl"""))

  /** AVRO OBJECT CONTAINER FILES under the oracle gate — the event/
    * Kafka-archive lake format beside parquet and ORC: per document,
    * synthesize a VALID `.avro` container
    * ([[graft.operators.AvroOcf.synth]]: real schema JSON in the
    * avro-binary metadata map, two data blocks, REAL raw-deflate or
    * snappy+CRC32 compression by hash — JDK Deflater/Inflater and
    * snappy-java both ways, block checksums verified),
    * then REALLY walk and decode it
    * ([[graft.operators.AvroOcf.probe]]: Jackson schema parse, sync
    * markers required equal on every block, zigzag-varint /
    * length-prefixed / single-byte record decode with exact per-block
    * payload tiling) and emit the container summary plus record-level
    * aggregates. The oracle recomputes every field — incl. the exact
    * UNCOMPRESSED payload byte count from the binary-encoding
    * arithmetic (1-byte zigzag ids below 64, 1-byte string lengths) —
    * so both the walk and the codec round-trip land in the hash.
    */
  val q254AvroOcf: QueryDef = QueryDef(
    "q254_avro_ocf",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.AvroOcf
        import graft.operators.AvroOcf._
        val k = 5 + r.n % 10
        val codec = Seq("deflate", "null", "snappy")(r.v % 3)
        val fields = Seq(AvroField("id", "long"), AvroField("name", "string"),
          AvroField("ok", "boolean"))
        val rows = (0 until k).map(i => Seq[Cell](
          LongCell((r.v + i) % 60),
          StrCell(('a' + (r.n + i) % 26).toChar.toString * (1 + (r.v + i) % 6)),
          BoolCell((r.n + i) % 3 == 0)))
        val bytes = AvroOcf.synth("ev", fields, rows, Seq(k / 2, k - k / 2),
          codec, r.v)
        val f = AvroOcf.probe(bytes)
          .getOrElse(sys.error(s"avro failed to probe: doc ${r.doc_id}"))
        require(f.rows == rows.map(_.toVector).toVector,
          s"record decode drift: doc ${r.doc_id}")
        val ids = f.rows.map { case Vector(LongCell(v), _, _) => v }
        val names = f.rows.map { case Vector(_, StrCell(s), _) => s }
        val oks = f.rows.map { case Vector(_, _, BoolCell(b)) => b }
        (r.doc_id, f.codec, f.recordName, f.fields.length,
          f.fields.map(_.name).mkString(","), f.nBlocks, f.nRecords,
          ids.sum, names.head, names.last, oks.count(identity),
          f.payloadBytes)
      }
      probed.toDF("doc_id", "codec", "rec_name", "n_fields", "field_names",
          "n_blocks", "n_records", "sum_ids", "first_name", "last_name",
          "n_ok", "payload_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 5 + n % 10 AS k FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(k), i -> (v + i) % 60)) AS sumids,
                   list_sum(list_transform(range(k), i ->
                     4 + (v + i) % 6)) AS payload,
                   list_sum(list_transform(range(k), i ->
                     CASE WHEN (n + i) % 3 = 0 THEN 1 ELSE 0 END)) AS nok
            FROM g)
      SELECT doc_id,
             ['deflate', 'null', 'snappy'][v % 3 + 1] AS codec,
             'ev' AS rec_name,
             CAST(3 AS INTEGER) AS n_fields,
             'id,name,ok' AS field_names,
             CAST(2 AS INTEGER) AS n_blocks,
             CAST(k AS INTEGER) AS n_records,
             CAST(sumids AS BIGINT) AS sum_ids,
             repeat(chr(CAST(97 + n % 26 AS INTEGER)), 1 + v % 6) AS first_name,
             repeat(chr(CAST(97 + (n + k - 1) % 26 AS INTEGER)),
               1 + (v + k - 1) % 6) AS last_name,
             CAST(nok AS INTEGER) AS n_ok,
             CAST(payload AS BIGINT) AS payload_bytes
      FROM t ORDER BY doc_id"""))

  /** PARQUET DATA-PAGE DECODE of the REAL lake files under the oracle
    * gate — the value-level half after q253's footer walk:
    * [[graft.operators.ParquetPages.readColumn]] decodes the actual
    * testdata columns end to end — Thrift page headers, SNAPPY page
    * decompression, RLE/bit-packed definition levels, PLAIN
    * dictionary pages + RLE_DICTIONARY index runs (and the writer's
    * mid-chunk PLAIN fallback when a dictionary overflows, which the
    * sf0.1 text column actually triggers) — and the per-column
    * aggregates of the DECODED values face the oracle's plain SQL
    * over the same tables. A slip anywhere (bit-packing order,
    * dictionary indexing, def-level accounting, snappy framing) lands
    * in the hash against ground truth read by a different stack.
    */
  val q255ParquetPages: QueryDef = QueryDef(
    "q255_parquet_pages",
    (s, dir) => {
      import s.implicits._
      val files = Seq("documents", "supplier").map { t =>
        s.read.format("binaryFile").load(s"$dir/$t.parquet")
          .select(lit(t).as("tbl"), col("content"))
      }.reduce(_ unionAll _).as[(String, Array[Byte])]
      val probed = files.map { case (t, bytes) =>
        import graft.operators.{ParquetFooter, ParquetPages}
        import graft.operators.ParquetPages.{PBin, PLong}
        val f = ParquetFooter.probe(bytes)
          .getOrElse(sys.error(s"footer probe failed: $t"))
        def col(name: String) = ParquetPages.readColumn(bytes,
          f.firstGroupChunks.find(_.pathInSchema == name)
            .getOrElse(sys.error(s"no chunk $name: $t")))
          .getOrElse(sys.error(s"page decode failed: $t.$name"))
        val (keyCol, auxCol, strCol, bytesCol) = t match {
          case "documents" => ("doc_id", "n_chars", "lang", "text")
          case _ => ("s_suppkey", "s_nationkey", "s_name", "s_name")
        }
        val keys = col(keyCol).flatten.collect { case PLong(v) => v }
        val aux = col(auxCol).flatten.collect { case PLong(v) => v }
        val strs = col(strCol).flatten.collect { case p: PBin => p.str }
        val byteLens = col(bytesCol).flatten
          .collect { case p: PBin => p.v.length.toLong }
        require(keys.length.toLong == f.numRows,
          s"decoded row count drift: $t")
        (t, keys.length.toLong, keys.sum, keys.min, keys.max, aux.sum,
          strs.distinct.length.toLong, strs.min, strs.max, byteLens.sum)
      }
      probed.toDF("tbl", "n_rows", "key_sum", "key_min", "key_max",
          "aux_sum", "n_distinct", "s_min", "s_max", "bytes_sum")
        .orderBy("tbl")
    },
    Some("""
      SELECT * FROM (
        SELECT 'documents' AS tbl,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS key_sum,
               CAST(min(doc_id) AS BIGINT) AS key_min,
               CAST(max(doc_id) AS BIGINT) AS key_max,
               CAST(sum(n_chars) AS BIGINT) AS aux_sum,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct,
               min(lang) AS s_min,
               max(lang) AS s_max,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes_sum
        FROM documents
        UNION ALL
        SELECT 'supplier',
               CAST(count(*) AS BIGINT),
               CAST(sum(s_suppkey) AS BIGINT),
               CAST(min(s_suppkey) AS BIGINT),
               CAST(max(s_suppkey) AS BIGINT),
               CAST(sum(s_nationkey) AS BIGINT),
               CAST(count(DISTINCT s_name) AS BIGINT),
               min(s_name), max(s_name),
               CAST(sum(octet_length(encode(s_name))) AS BIGINT)
        FROM supplier
      ) ORDER BY tbl"""))

  /** UTF-8 VALIDATION + REPAIR under the oracle gate — the ingest
    * step that runs before any tokenizer sees crawl bytes: per
    * document, build a raw byte payload with a doc-selected
    * malformation injected between valid ASCII and multi-byte spans
    * (truncated 2/3-byte leads, the overlong NUL C0 80, a UTF-16
    * surrogate ED A0 80, the beyond-U+10FFFF F4 90 80 80), then run
    * the codegen'd [[graft.plans.Utf8Scrub]] expression IN THE PLAN
    * (binary → struct, Unicode maximal-subpart replacement). The
    * oracle rebuilds the repaired string — replacement characters
    * included, `chr(65533)` per subpart — and every count in closed
    * form, so a decoder that merges or splits subparts differently
    * (each malformation class yields a DIFFERENT replacement count)
    * lands in the hash.
    */
  val q256Utf8Scrub: QueryDef = QueryDef(
    "q256_utf8_scrub",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val payloads = src.map { r =>
        val la = 5 + r.n % 10
        val lb = 3 + r.v % 7
        val m = 1 + r.n % 4
        val bad: Array[Byte] = (r.v % 5 match {
          case 0 => Array(0xC3)
          case 1 => Array(0xE1, 0x80)
          case 2 => Array(0xC0, 0x80)
          case 3 => Array(0xED, 0xA0, 0x80)
          case _ => Array(0xF4, 0x90, 0x80, 0x80)
        }).map(_.toByte)
        val bytes = Array.fill(la)(('a' + r.n % 26).toByte) ++ bad ++
          Array.fill(m)(Array(0xC3.toByte, 0xA9.toByte)).flatten ++
          Array.fill(lb)(('a' + r.v % 26).toByte)
        (r.doc_id, bytes)
      }.toDF("doc_id", "payload")
      payloads
        .select(col("doc_id"), graft.plans.Utf8Scrub(col("payload")).as("r"),
          octet_length(col("payload")).cast("long").as("raw_bytes"))
        .select(col("doc_id"), col("r.repaired").as("repaired"),
          col("r.n_invalid").as("n_invalid"), col("r.n_chars").as("n_chars"),
          col("raw_bytes"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   5 + n % 10 AS la,
                   3 + v % 7 AS lb,
                   1 + n % 4 AS m,
                   [1, 1, 2, 3, 4][v % 5 + 1] AS nrep,
                   [1, 2, 2, 3, 4][v % 5 + 1] AS badlen
            FROM d)
      SELECT doc_id,
             repeat(chr(97 + n % 26), la) || repeat(chr(65533), nrep)
               || repeat(chr(233), m) || repeat(chr(97 + v % 26), lb)
               AS repaired,
             CAST(nrep AS INTEGER) AS n_invalid,
             CAST(la + nrep + m + lb AS INTEGER) AS n_chars,
             CAST(la + badlen + 2 * m + lb AS BIGINT) AS raw_bytes
      FROM g ORDER BY doc_id"""))

  /** UNICODE NFC NORMALIZATION under the oracle gate — the canonical-
    * composition pass that makes `e`+U+0301 and the precomposed `é`
    * the same text for hashing/dedup/joins: per document, build a
    * string mixing plain ASCII with decomposed combining sequences
    * (e+combining-acute, A+combining-ring on even hashes), then run
    * the codegen'd [[graft.plans.NfcNormalize]] expression in the
    * plan. The oracle applies DuckDB's own `nfc_normalize` to the
    * same constructed string — two INDEPENDENT normalization
    * implementations (JDK vs ICU-derived) must agree character for
    * character, and the before/after length delta pins exactly how
    * many sequences composed.
    */
  val q257NfcNormalize: QueryDef = QueryDef(
    "q257_nfc_normalize",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val payloads = src.map { r =>
        val m = 1 + r.v % 4
        val raw = ("a" + ('a' + r.n % 26).toChar).take(1 + r.n % 2) +
          ('a' + r.n % 26).toChar.toString * (1 + r.n % 5) +
          "e\u0301" * m +
          (if (r.v % 2 == 0) "A\u030A" else "") +
          ('a' + r.v % 26).toChar.toString * (2 + r.v % 3)
        (r.doc_id, raw)
      }.toDF("doc_id", "raw")
      payloads
        .select(col("doc_id"), col("raw"),
          graft.plans.NfcNormalize(col("raw")).as("normalized"))
        .select(col("doc_id"), col("normalized"),
          (col("normalized") =!= col("raw")).as("changed"),
          length(col("raw")).cast("int").as("raw_chars"),
          length(col("normalized")).cast("int").as("norm_chars"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   substr('a' || chr(97 + n % 26), 1, 1 + n % 2)
                     || repeat(chr(97 + n % 26), 1 + n % 5)
                     || repeat('e' || chr(769), 1 + v % 4)
                     || (CASE WHEN v % 2 = 0 THEN 'A' || chr(778) ELSE '' END)
                     || repeat(chr(97 + v % 26), 2 + v % 3) AS raw
            FROM d)
      SELECT doc_id,
             nfc_normalize(raw) AS normalized,
             nfc_normalize(raw) != raw AS changed,
             CAST(length(raw) AS INTEGER) AS raw_chars,
             CAST(length(nfc_normalize(raw)) AS INTEGER) AS norm_chars
      FROM g ORDER BY doc_id"""))

  /** ORC FILE-TAIL PROBE under the oracle gate — the third lake
    * format's metadata read beside q253 (parquet/Thrift) and q254
    * (avro): the documents table is round-tripped through Spark's ORC
    * writer under BOTH `none` and `snappy` (the memoized
    * [[graft.sources.CompressedIngest.documentsOrc]] dump), and every
    * written file's tail is decoded by
    * [[graft.operators.OrcFooter.probe]] — a generic protobuf reader
    * over the public orc_proto layout, the ORC 3-byte-header block
    * deframing REALLY decompressing the snappy footer, sint64 zigzag
    * statistics — then the per-file numbers aggregate back to totals
    * the oracle derives straight from the data: row counts, the key
    * column's min/max/SUM (the sum rides the stats, not the data),
    * and the text column's min/max strings. The type-tree shape and
    * stripe-row consistency are require()d per file.
    */
  val q258OrcFooter: QueryDef = QueryDef(
    "q258_orc_footer",
    (s, dir) => {
      import s.implicits._
      val files = Seq("none", "snappy").map { codec =>
        // the memoized call materializes the dump before the probe scan
        graft.sources.CompressedIngest.documentsOrc(s, dir, codec)
        val path = graft.sources.CompressedIngest.dumpPath(dir, s"orc_$codec")
        s.read.format("binaryFile").option("pathGlobFilter", "*.orc")
          .load(path)
          .select(lit(codec).as("codec"), col("content"))
      }.reduce(_ unionAll _).as[(String, Array[Byte])]
      val perFile = files.map { case (codec, bytes) =>
        import graft.operators.OrcFooter
        val f = OrcFooter.probe(bytes)
          .getOrElse(sys.error(s"orc tail probe failed: $codec"))
        require(f.typeKinds == Vector(12, 4, 7),
          s"unexpected type tree: ${f.typeKinds}")
        require(f.stats.head.numValues == f.numRows,
          s"root stats disagree with footer rows: $codec")
        val ks = f.stats(1)
        val ts = f.stats(2)
        (codec, f.compression, f.numRows,
          ks.intMin.getOrElse(Long.MaxValue), ks.intMax.getOrElse(Long.MinValue),
          ks.intSum.getOrElse(0L), ts.strMin.orNull, ts.strMax.orNull)
      }.toDF("codec", "compression", "rows", "kmin", "kmax", "ksum",
        "smin", "smax")
      perFile.groupBy("codec", "compression")
        .agg(sum("rows").as("n_rows"), min("kmin").as("key_min"),
          max("kmax").as("key_max"), sum("ksum").as("key_sum"),
          min("smin").as("s_min"), max("smax").as("s_max"))
        .orderBy("codec")
    },
    Some("""
      SELECT * FROM (
        SELECT 'none' AS codec, 'NONE' AS compression,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(doc_id) AS BIGINT) AS key_min,
               CAST(max(doc_id) AS BIGINT) AS key_max,
               CAST(sum(doc_id) AS BIGINT) AS key_sum,
               min(text) AS s_min, max(text) AS s_max
        FROM documents
        UNION ALL
        SELECT 'snappy', 'SNAPPY',
               CAST(count(*) AS BIGINT),
               CAST(min(doc_id) AS BIGINT), CAST(max(doc_id) AS BIGINT),
               CAST(sum(doc_id) AS BIGINT),
               min(text), max(text)
        FROM documents
      ) ORDER BY codec"""))

  /** TFRECORD / tf.Example SHARDS under the oracle gate — the
    * TensorFlow training-data container itself: per document,
    * synthesize a VALID shard ([[graft.operators.TfRecord.synth]]:
    * length-framed records with TRUE masked CRC32C pairs — the JDK's
    * Castagnoli CRC under TensorFlow's rotate-and-add mask — and real
    * tf.Example protobuf payloads with PACKED int64/float lists),
    * then REALLY walk and decode it
    * ([[graft.operators.TfRecord.probe]]: both checksums verified per
    * record — the spec proves EVERY single-byte flip anywhere in a
    * shard rejects — and the packed-encoding blobs re-split into
    * values). The oracle recomputes the feature aggregates, exact
    * ×4-integer float sums, and the byte-exact framing arithmetic
    * (varint widths included) in closed form.
    */
  val q259TfRecord: QueryDef = QueryDef(
    "q259_tfrecord",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.TfRecord
        import graft.operators.TfRecord._
        val k = 2 + r.n % 4
        val examples = (0 until k).map { j =>
          val cap = ('a' + (r.v + j) % 26).toChar.toString * (5 + (r.n + j) % 10)
          Seq(
            "caption" -> BytesFeature(Vector(cap.getBytes("UTF-8"))),
            "labels" -> Int64Feature(Vector(
              ((r.v + j) % 60).toLong, 300L + r.n, (1L << 35) + r.v)),
            "scores" -> FloatFeature(Vector(
              (r.v % 8) * 0.25f - 1f, j * 0.5f)))
        }
        val bytes = TfRecord.synth(examples)
        val t = TfRecord.probe(bytes)
          .getOrElse(sys.error(s"shard failed to probe: doc ${r.doc_id}"))
        require(t.nRecords == k, s"record count drift: doc ${r.doc_id}")
        val labels = t.examples.flatMap(
          _.features("labels").asInstanceOf[Int64Feature].vs)
        val captions = t.examples.map(
          _.features("caption").asInstanceOf[BytesFeature].strs.head)
        val scoreX4 = t.examples.flatMap(
          _.features("scores").asInstanceOf[FloatFeature].vs)
          .map(f => (f * 4).toLong).sum
        (r.doc_id, t.nRecords, labels.length, labels.sum,
          captions.map(_.length.toLong).sum, captions.head, scoreX4,
          t.payloadBytes, bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_records", "n_labels", "label_sum",
          "caption_chars", "first_caption", "score_sum_x4",
          "payload_bytes", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 2 + n % 4 AS k FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(k), j ->
                     (v + j) % 60 + 300 + n + 34359738368 + v)) AS lsum,
                   list_sum(list_transform(range(k), j ->
                     5 + (n + j) % 10)) AS capchars,
                   list_sum(list_transform(range(k), j ->
                     (v % 8) - 4 + 2 * j)) AS sx4
            FROM g)
      SELECT doc_id,
             CAST(k AS INTEGER) AS n_records,
             CAST(3 * k AS INTEGER) AS n_labels,
             CAST(lsum AS BIGINT) AS label_sum,
             CAST(capchars AS BIGINT) AS caption_chars,
             repeat(chr(CAST(97 + v % 26 AS INTEGER)), 5 + n % 10)
               AS first_caption,
             CAST(sx4 AS BIGINT) AS score_sum_x4,
             CAST(68 * k + capchars AS BIGINT) AS payload_bytes,
             CAST(84 * k + capchars AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** ZSTD FRAME WALK under the oracle gate — the byte-level
    * introspection of the codec this engine otherwise reads only
    * through Spark's scans: per document, synthesize a VALID .zst
    * image ([[graft.operators.ZstdFrames.synthFrame]]: RFC 8878 frame
    * header with the narrowest content-size form, an RLE block + raw
    * blocks, a TRUE XXH64 content checksum; on every third hash a
    * skippable frame in front — the spec proves these bytes are real
    * zstd by decoding them with the reference zstd library), then
    * REALLY walk it ([[graft.operators.ZstdFrames.probe]]: descriptor
    * flags, block tiling, raw/RLE decode, checksum VERIFIED). The
    * oracle rebuilds the decoded text, every count, and the exact
    * block-by-block file geometry in closed form.
    */
  val q260ZstdFrames: QueryDef = QueryDef(
    "q260_zstd_frames",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.ZstdFrames
        val rleRun = r.v % 6
        val clen = 20 + r.v % 40
        val rawBlock = 7 + r.n % 5
        val content = ('a' + r.n % 26).toChar.toString * clen
        val frame = ZstdFrames.synthFrame(content.getBytes("UTF-8"),
          rleRun, 'r'.toByte, rawBlock, withChecksum = true)
        val skip =
          if (r.v % 3 == 0)
            ZstdFrames.synthSkippable(10 + r.n % 20, i => i * 7 + r.v,
              nibble = r.v % 16)
          else Array.emptyByteArray
        val bytes = skip ++ frame
        val info = ZstdFrames.probe(bytes)
          .getOrElse(sys.error(s"zstd walk failed: doc ${r.doc_id}"))
        require(info.nFrames == 1, s"frame count drift: doc ${r.doc_id}")
        val f = info.frames.head
        (r.doc_id, info.nSkippable, info.skippableBytes,
          f.contentSizeDeclared.getOrElse(-1L), f.nBlocks, f.hasChecksum,
          f.decodedBytes.getOrElse(-1L), f.decodedText.orNull,
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_skippable", "skippable_bytes",
          "content_size", "n_blocks", "has_checksum", "decoded_bytes",
          "decoded_text", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   v % 6 AS rle,
                   20 + v % 40 AS clen,
                   7 + n % 5 AS rawblk,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS hasskip,
                   10 + n % 20 AS skiplen
            FROM d),
      t AS (SELECT *,
                   (clen + rawblk - 1) // rawblk AS nraw
            FROM g)
      SELECT doc_id,
             CAST(hasskip AS INTEGER) AS n_skippable,
             CAST(hasskip * skiplen AS BIGINT) AS skippable_bytes,
             CAST(rle + clen AS BIGINT) AS content_size,
             CAST((CASE WHEN rle > 0 THEN 1 ELSE 0 END) + nraw AS INTEGER)
               AS n_blocks,
             TRUE AS has_checksum,
             CAST(rle + clen AS BIGINT) AS decoded_bytes,
             repeat('r', rle) || repeat(chr(CAST(97 + n % 26 AS INTEGER)), clen)
               AS decoded_text,
             CAST(hasskip * (8 + skiplen)
                  + 6 + (CASE WHEN rle > 0 THEN 4 ELSE 0 END)
                  + 3 * nraw + clen + 4 AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** ARROW IPC FILES under the oracle gate — the interchange format
    * Spark ships the jars for but cannot scan: per document, a REAL
    * Arrow file is written by the ARROW JAVA LIBRARY itself (two
    * record batches of nullable int64/utf8/int32 columns with planted
    * nulls), then decoded by [[graft.operators.ArrowIpc.probe]] — the
    * hand-rolled flatbuffers reader (vtables, inline struct vectors,
    * union tags) walking footer → blocks → record batches → validity
    * bitmaps → values. The oracle recomputes every aggregate of the
    * decoded values in closed form, so a slip in the bitmap bit
    * order, the offsets buffer, or the batch concatenation lands in
    * the hash; the reference-library round trip proves the reader
    * against the format's own implementation at every row.
    */
  val q261ArrowIpc: QueryDef = QueryDef(
    "q261_arrow_ipc",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import org.apache.arrow.vector.{BigIntVector, IntVector, VarCharVector}
        import org.apache.arrow.vector.ipc.ArrowFileWriter
        import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
        import graft.operators.{ArrowIpc, ArrowSynth}
        import graft.operators.ArrowIpc.{ALong, AStr}
        // ONE allocator + root per PARTITION (ArrowSynth), not per row: a
        // per-row RootAllocator is ledger-build/teardown churn that the
        // round-10 driver bench measured as a 13x-slower warm re-run
        val schema = new Schema(java.util.Arrays.asList(
          new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
          new Field("name", FieldType.nullable(new ArrowType.Utf8()), null),
          new Field("grp", FieldType.nullable(new ArrowType.Int(32, true)), null)))
        ArrowSynth.mapWithRootAndBuffer(rows, schema) { (r, root, out) =>
          val k1 = 3 + r.n % 5
          val k2 = 2 + r.v % 4
          def nameAt(j: Int): String =
            ('a' + (r.n + j) % 26).toChar.toString * (1 + (r.v + j) % 5)
          val w = new ArrowFileWriter(root, null,
            java.nio.channels.Channels.newChannel(out))
          w.start()
          var j = 0
          Seq(k1, k2).foreach { k =>
            // in-place zero between batches — never allocateNew (the
            // partition-pooled buffers are the round-14 q273-band fix)
            ArrowSynth.resetRoot(root)
            val idv = root.getVector("id").asInstanceOf[BigIntVector]
            val nv = root.getVector("name").asInstanceOf[VarCharVector]
            val gv = root.getVector("grp").asInstanceOf[IntVector]
            (0 until k).foreach { i =>
              if (j == 1) idv.setNull(i)
              else idv.setSafe(i, ((r.v + j) % 100).toLong)
              if (j == 2) nv.setNull(i)
              else nv.setSafe(i, nameAt(j).getBytes("UTF-8"))
              gv.setSafe(i, (r.n + j) % 50)
              j += 1
            }
            root.setRowCount(k)
            w.writeBatch()
          }
          w.end(); w.close()
          val bytes = out.toByteArray
          val info = ArrowIpc.probe(bytes)
            .getOrElse(sys.error(s"arrow decode failed: doc ${r.doc_id}"))
          require(info.batchRows == Vector(k1.toLong, k2.toLong),
            s"batch shape drift: doc ${r.doc_id}")
          val ids = info.columns(0)
          val names = info.columns(1)
          val grps = info.columns(2)
          (r.doc_id, info.nBatches, info.nRows,
            info.fields.map(f => s"${f.name}:${f.ftype}").mkString(","),
            ids.flatten.map { case ALong(x) => x }.sum,
            ids.count(_.isEmpty),
            names.flatten.collect { case AStr(x) => x }.headOption.orNull,
            names.count(_.isEmpty),
            grps.flatten.map { case ALong(x) => x }.sum)
        }
      }
      probed.toDF("doc_id", "n_batches", "n_rows", "schema_sig", "id_sum",
          "id_nulls", "first_name", "name_nulls", "grp_sum")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   (3 + n % 5) + (2 + v % 4) AS total
            FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(total), j ->
                     CASE WHEN j = 1 THEN 0 ELSE (v + j) % 100 END)) AS idsum,
                   list_sum(list_transform(range(total), j ->
                     (n + j) % 50)) AS grpsum
            FROM g)
      SELECT doc_id,
             CAST(2 AS INTEGER) AS n_batches,
             CAST(total AS BIGINT) AS n_rows,
             'id:int64,name:utf8,grp:int32' AS schema_sig,
             CAST(idsum AS BIGINT) AS id_sum,
             CAST(1 AS INTEGER) AS id_nulls,
             repeat(chr(CAST(97 + n % 26 AS INTEGER)), 1 + v % 5) AS first_name,
             CAST(1 AS INTEGER) AS name_nulls,
             CAST(grpsum AS BIGINT) AS grp_sum
      FROM t ORDER BY doc_id"""))

  /** DELTA-STYLE LOG REPLAY under the oracle gate — the lakehouse
    * table-format primitive: a REAL JSON action log (one `add` per
    * document, `remove` tombstones on every third hash, re-`add`
    * resurrections on every ninth, `commitInfo` noise lines a reader
    * must ignore) is built with `format_string`, parsed back with
    * `from_json`, and folded to table state by
    * [[graft.operators.DeltaReplay.replay]] — ONE `max_by(action,
    * version)` hash aggregation per path, no window, no self-join,
    * no driver fold. The oracle recomputes the live set, its byte
    * total, the tombstone count, and the newest version per the same
    * last-writer-wins rules in closed form.
    */
  val q262DeltaReplay: QueryDef = QueryDef(
    "q262_delta_replay",
    (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      val adds = d.select(
        (col("doc_id") % 50).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n")).as("line"))
      val commits = d.select(
        (col("doc_id") % 50).as("version"),
        lit("""{"commitInfo":{"operation":"WRITE"}}""").as("line"))
      val removes = d.filter(col("v") % 3 === 0).select(
        (lit(50L) + col("v") % 10).as("version"),
        format_string(
          """{"remove":{"path":"part-%d","deletionTimestamp":%d}}""",
          col("doc_id"), col("n") * 1000L).as("line"))
      val readds = d.filter(col("v") % 9 === 0).select(
        (lit(65L) + col("v") % 5).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n") * 2L).as("line"))
      val log = adds.unionAll(commits).unionAll(removes).unionAll(readds)
      val state = graft.operators.DeltaReplay.replay(log)
      val nActions = log.count()
      state.agg(
        count(lit(1)).as("n_paths"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("n_live"),
        sum(when(!col("is_live"), 1L).otherwise(0L)).as("n_tombstones"),
        coalesce(sum(col("size")), lit(0L)).as("live_bytes"),
        max(col("last_version")).as("max_version"))
        .select(lit(nActions).as("n_actions"), col("n_paths"),
          col("n_live"), col("n_tombstones"), col("live_bytes"),
          col("max_version"))
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS removed,
                   CASE WHEN v % 9 = 0 THEN 1 ELSE 0 END AS readded
            FROM d)
      SELECT CAST(SUM(2 + removed + readded) AS BIGINT) AS n_actions,
             CAST(COUNT(*) AS BIGINT) AS n_paths,
             CAST(SUM(CASE WHEN removed = 0 OR readded = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_live,
             CAST(SUM(CASE WHEN removed = 1 AND readded = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tombstones,
             CAST(SUM(CASE WHEN readded = 1 THEN 2 * n
                           WHEN removed = 0 THEN n ELSE 0 END)
               AS BIGINT) AS live_bytes,
             CAST(MAX(CASE WHEN readded = 1 THEN 65 + v % 5
                           WHEN removed = 1 THEN 50 + v % 10
                           ELSE doc_id % 50 END) AS BIGINT) AS max_version
      FROM g"""))

  /** STREAMING delta-replay STATE under the oracle gate — the q208/
    * q209 protocol applied to table-state maintenance: the EXACT
    * `mapGroupsWithState` function the continuous
    * [[graft.operators.DeltaReplay.replayStream]] twin executes (per-
    * path fold with the newer-than-held guard, so stale late actions
    * cannot regress state) runs here in BATCH mode over the same
    * synthesized action log as q262, and its aggregated table state
    * must hash-match the closed-form oracle. StreamingSpec separately
    * proves stream == batch at every micro-batch prefix; this query
    * puts the state transition itself on the DuckDB gate.
    */
  val q263DeltaReplayStream: QueryDef = QueryDef(
    "q263_delta_replay_stream",
    (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      val adds = d.select(
        (col("doc_id") % 50).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n")).as("line"))
      val removes = d.filter(col("v") % 3 === 0).select(
        (lit(50L) + col("v") % 10).as("version"),
        format_string(
          """{"remove":{"path":"part-%d","deletionTimestamp":%d}}""",
          col("doc_id"), col("n") * 1000L).as("line"))
      val readds = d.filter(col("v") % 9 === 0).select(
        (lit(65L) + col("v") % 5).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n") * 2L).as("line"))
      val log = adds.unionAll(removes).unionAll(readds)
      graft.operators.DeltaReplay.replayStream(log)
        .agg(
          count(lit(1)).as("n_paths"),
          sum(when(col("is_live"), 1L).otherwise(0L)).as("n_live"),
          sum(when(!col("is_live"), 1L).otherwise(0L)).as("n_tombstones"),
          coalesce(sum(col("size")), lit(0L)).as("live_bytes"),
          max(col("last_version")).as("max_version"))
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS removed,
                   CASE WHEN v % 9 = 0 THEN 1 ELSE 0 END AS readded
            FROM d)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
             CAST(SUM(CASE WHEN removed = 0 OR readded = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_live,
             CAST(SUM(CASE WHEN removed = 1 AND readded = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tombstones,
             CAST(SUM(CASE WHEN readded = 1 THEN 2 * n
                           WHEN removed = 0 THEN n ELSE 0 END)
               AS BIGINT) AS live_bytes,
             CAST(MAX(CASE WHEN readded = 1 THEN 65 + v % 5
                           WHEN removed = 1 THEN 50 + v % 10
                           ELSE doc_id % 50 END) AS BIGINT) AS max_version
      FROM g"""))

  /** SFT CHAT-TEMPLATE RENDERING under the oracle gate — the step
    * that turns conversations into training strings: per document, a
    * synthetic conversation (optional system turn, alternating
    * user/assistant turns of varying token widths) renders through
    * [[graft.operators.SftFormat]] — the ChatML-style template, the
    * greedy keep-the-newest-whole-turns TOKEN-BUDGET truncation with
    * the system turn always surviving, and the LOSS-MASK accounting
    * (assistant-content characters, the only spans SFT trains on).
    * The oracle rebuilds the suffix selection (a list_filter over
    * suffix sums), the kept-token totals, the per-role rendered
    * length arithmetic, and the mask totals in closed form — an
    * off-by-one in the greedy boundary moves every downstream number.
    */
  val q264SftFormat: QueryDef = QueryDef(
    "q264_sft_format",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.SftFormat
        import graft.operators.SftFormat.Turn
        val hasSys = r.v % 4 == 0
        val k = 3 + r.n % 6
        def word(len: Int, ch: Int): String =
          ('a' + ch % 26).toChar.toString * len
        val sysTurn =
          if (hasSys) {
            val w = word(1 + r.v % 3, r.v)
            Seq(Turn("system", s"$w $w"))
          } else Nil
        val rest = (0 until k).map { j =>
          val w = word(1 + (r.v + j) % 4, r.n + j)
          val t = 2 + (r.n + j) % 8
          Turn(if (j % 2 == 0) "user" else "assistant",
            Seq.fill(t)(w).mkString(" "))
        }
        val budget = 10 + r.n % 30
        val out = SftFormat.render(sysTurn ++ rest, budget)
        require(out.keptTokens <= budget,
          s"budget exceeded: doc ${r.doc_id}")
        (r.doc_id, sysTurn.length + k, out.keptTurns, out.keptTokens,
          out.assistantTurns, out.assistantChars,
          out.text.length.toLong, out.firstKeptRole)
      }
      probed.toDF("doc_id", "n_turns_in", "kept_turns", "kept_tokens",
          "assistant_turns", "assistant_chars", "rendered_chars",
          "first_kept_role")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 4 = 0 THEN 1 ELSE 0 END AS hassys,
                   3 + n % 6 AS k,
                   10 + n % 30 AS b,
                   1 + v % 3 AS wls
            FROM d),
      t AS (SELECT *,
                   list_transform(range(k), j -> 2 + (n + j) % 8) AS toks,
                   list_transform(range(k), j ->
                     (2 + (n + j) % 8) * (1 + (v + j) % 4 + 1) - 1) AS chs,
                   b - hassys * 2 AS avail
            FROM g),
      u AS (SELECT *,
                   len(list_filter(range(k), j ->
                     list_sum(list_slice(toks, j + 1, k)) > avail)) AS m
            FROM t)
      SELECT doc_id,
             CAST(hassys + k AS INTEGER) AS n_turns_in,
             CAST(hassys + k - m AS INTEGER) AS kept_turns,
             CAST(hassys * 2
                  + coalesce(list_sum(list_slice(toks, m + 1, k)), 0)
               AS INTEGER) AS kept_tokens,
             CAST(len(list_filter(range(k), j ->
               j >= m AND j % 2 = 1)) AS INTEGER) AS assistant_turns,
             CAST(coalesce(list_sum(list_transform(range(k), j ->
               CASE WHEN j >= m AND j % 2 = 1 THEN chs[j + 1] ELSE 0 END)), 0)
               AS BIGINT) AS assistant_chars,
             CAST(hassys * (24 + 6 + 2 * (wls + 1) - 1)
                  + coalesce(list_sum(list_transform(range(k), j ->
                      CASE WHEN j >= m
                           THEN 24 + (CASE WHEN j % 2 = 0 THEN 4 ELSE 9 END)
                                + chs[j + 1]
                           ELSE 0 END)), 0)
               AS BIGINT) AS rendered_chars,
             CASE WHEN hassys = 1 THEN 'system'
                  WHEN m = k THEN ''
                  WHEN m % 2 = 0 THEN 'user' ELSE 'assistant' END
               AS first_kept_role
      FROM u ORDER BY doc_id"""))

  /** ID3v2 UNSYNCHRONISATION under the oracle gate — the last ID3
    * decline turned real: per document, a v2.2 or v2.3 tag whose
    * UCS-2 text frames guarantee 0xFF bytes (the BOM's second half)
    * is synthesized WITH the whole-tag unsynchronisation scheme on
    * even hashes — every FF gains a 00 successor and the declared
    * size counts the ENCODED form — then [[graft.operators.Id3.parse]]
    * collapses the FF 00 pairs back before the frame walk and
    * [[graft.operators.MpegFrames.probe]] skips the same tag by its
    * declared size, cross-checked row by row over a real MPEG stream.
    * The oracle counts the FF bytes in closed form (exactly one per
    * UCS-2 frame here), so an encoder or decoder that misses one pair
    * shifts `tag_bytes` and `file_bytes` into the hash.
    */
  val q265Id3Unsync: QueryDef = QueryDef(
    "q265_id3_unsync",
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
        val major = 2 + r.n % 2
        val unsync = r.v % 2 == 0
        val (tTitle, tArtist, tAlbum) =
          if (major == 2) ("TT2", "TP1", "TAL") else ("TIT2", "TPE1", "TALB")
        val title = "t" + ('a' + r.v % 26).toChar.toString * (1 + r.n % 6)
        val artist = "a" + ('a' + (r.n + r.v) % 26).toChar.toString * (1 + r.v % 4)
        val album = "b" + ('a' + r.n % 26).toChar.toString * (1 + (r.n + r.v) % 5)
        val tagBytes = Id3.synthTag(major,
          Seq((tTitle, title, 1), (tArtist, artist, 1), (tAlbum, album, 1)),
          padding = 0, unsync = unsync)
        val layer = 1 + r.v % 3
        val srIdx = r.n % 3
        val k = 2 + r.v % 3
        val frames = (0 until k).map(j => (1 + (r.v + j) % 14, (r.n + j) % 2 == 0))
        val bytes = tagBytes ++ MpegFrames.synthStream(
          layer, srIdx, frames, (fi, j) => (fi * 17 + j * 3) % 251)
        val info = MpegFrames.probe(bytes)
          .getOrElse(sys.error(s"stream failed to probe: doc ${r.doc_id}"))
        val tag = Id3.parse(bytes)
          .getOrElse(sys.error(s"tag failed to parse: doc ${r.doc_id}"))
        require(info.id3v2Bytes == tag.tagBytes,
          s"tag-span disagreement on doc ${r.doc_id}")
        (r.doc_id, tag.major, tag.unsync, tag.tagBytes.toLong, tag.nFrames,
          tag.text(tTitle).orNull, tag.text(tArtist).orNull,
          tag.text(tAlbum).orNull, info.nFrames, info.durationMs,
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "major", "unsync", "tag_bytes", "n_id3_frames",
          "title", "artist", "album", "n_mpeg_frames", "duration_ms",
          "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + n % 2 AS major,
                   CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS uns,
                   CASE WHEN n % 2 = 0 THEN 6 ELSE 10 END AS hdr,
                   2 + n % 6 AS len_t,
                   2 + v % 4 AS len_a,
                   2 + (n + v) % 5 AS len_b,
                   CAST(1 + v % 3 AS INTEGER) AS layer,
                   [44100, 48000, 32000][n % 3 + 1] AS sr,
                   2 + v % 3 AS k
            FROM d),
      t AS (SELECT *,
                   (hdr + 1 + 2 + 2 * len_t)
                 + (hdr + 1 + 2 + 2 * len_a)
                 + (hdr + 1 + 2 + 2 * len_b)
                 + uns * 3 AS tag_body,
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
             CAST(major AS INTEGER) AS major,
             uns = 1 AS unsync,
             CAST(10 + tag_body AS BIGINT) AS tag_bytes,
             CAST(3 AS INTEGER) AS n_id3_frames,
             't' || repeat(chr(CAST(97 + v % 26 AS INTEGER)), 1 + n % 6) AS title,
             'a' || repeat(chr(CAST(97 + (n + v) % 26 AS INTEGER)), 1 + v % 4) AS artist,
             'b' || repeat(chr(CAST(97 + n % 26 AS INTEGER)), 1 + (n + v) % 5) AS album,
             CAST(k AS INTEGER) AS n_mpeg_frames,
             CAST(CAST(k AS BIGINT) * spf * 1000 // sr AS BIGINT) AS duration_ms,
             CAST(10 + tag_body + list_sum(list_transform(range(k), j ->
               CASE WHEN layer = 1
                    THEN (12000 * kbps[j + 1] // sr + pads[j + 1]) * 4
                    ELSE 144000 * kbps[j + 1] // sr + pads[j + 1] END))
               AS BIGINT) AS file_bytes
      FROM t ORDER BY doc_id"""))

  /** MP4 SAMPLE-TO-CHUNK TABLES under the oracle gate — the last stbl
    * member (stts/stsz/stco q229, ctts q235, stss/co64 q248, stsc
    * HERE): per document, a two-run chunking schedule — the first
    * chunks carry `a` samples each, the tail chunks `b` — whose
    * IMPLIED sample total over the chunk table must equal the stts
    * count ([[graft.operators.Mp4Boxes.probe]] enforces the
    * cross-table invariant; the spec proves a lying run schedule,
    * non-increasing first_chunk, a first run not at chunk 1, and a
    * run past the chunk count all reject). The oracle recomputes the
    * schedule arithmetic and the file geometry in closed form.
    */
  val q266Mp4Stsc: QueryDef = QueryDef(
    "q266_mp4_stsc",
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
        import graft.operators.Mp4Boxes.SynthTrack
        val c = 3 + r.n % 6
        val a = 2 + r.v % 4
        val b2 = 1 + r.n % 3
        val m = 2 + r.v % (c - 1)
        val ns = (m - 1) * a + (c - m + 1) * b2
        val mdatLen = 10 + r.v % 9
        val vt = SynthTrack(1, "vide", "avc1", 640, 360, 600,
          ns.toLong * 100, "eng",
          sttsEntries = Seq((ns.toLong, 100L)),
          sizes = Some(Left(40L)), chunks = c,
          stscRuns = Seq((1L, a.toLong), (m.toLong, b2.toLong)))
        val bytes = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600,
          ns.toLong * 100, Seq(vt), mdatLen, i => (i * 13 + 1) % 251)
        val info = Mp4Boxes.probe(bytes)
          .getOrElse(sys.error(s"mp4 failed to probe: doc ${r.doc_id}"))
        val st = info.tracks.head.samples
          .getOrElse(sys.error(s"no sample tables: doc ${r.doc_id}"))
        val sc = st.stsc
          .getOrElse(sys.error(s"no stsc: doc ${r.doc_id}"))
        require(sc.impliedSamples == st.sampleCount,
          s"invariant broke: doc ${r.doc_id}")
        (r.doc_id, st.sampleCount, st.chunkCount, sc.entryCount,
          sc.maxPerChunk, sc.impliedSamples, st.totalSampleBytes,
          bytes.length.toLong)
      }
      probed.toDF("doc_id", "n_samples", "n_chunks", "stsc_entries",
          "max_per_chunk", "implied_samples", "sample_bytes", "file_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   3 + n % 6 AS c,
                   2 + v % 4 AS a,
                   1 + n % 3 AS b2,
                   10 + v % 9 AS mdatlen
            FROM d),
      t AS (SELECT *,
                   2 + v % (c - 1) AS m
            FROM g),
      u AS (SELECT *,
                   (m - 1) * a + (c - m + 1) * b2 AS ns
            FROM t)
      SELECT doc_id,
             CAST(ns AS BIGINT) AS n_samples,
             CAST(c AS BIGINT) AS n_chunks,
             CAST(2 AS BIGINT) AS stsc_entries,
             CAST(greatest(a, b2) AS BIGINT) AS max_per_chunk,
             CAST(ns AS BIGINT) AS implied_samples,
             CAST(CAST(ns AS BIGINT) * 40 AS BIGINT) AS sample_bytes,
             CAST(465 + 4 * c + mdatlen AS BIGINT) AS file_bytes
      FROM u ORDER BY doc_id"""))

  /** CSV DIALECT INFERENCE under the oracle gate — the
    * delimiter-ambiguity step real ingest piles force: per document,
    * REAL RFC 4180 text is rendered under a doc-chosen delimiter with
    * every trap planted — a DIFFERENT candidate delimiter embedded
    * inside an UNQUOTED field (that candidate then parses every record
    * consistently at a LOWER arity, so only the max-arity rule, not
    * mere consistency, lands on the truth), an escaped quote — then
    * [[graft.operators.CsvDialect.infer]] scores candidates with the
    * quote-aware parse and [[graft.operators.CsvDialect.parse]]
    * round-trips the records. The oracle rebuilds the inferred
    * dialect, the record/field counts, the trap-bearing first data
    * cell, and the exact rendered character count (quoting overhead
    * included) in closed form.
    */
  val q267CsvDialect: QueryDef = QueryDef(
    "q267_csv_dialect",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.CsvDialect
        val cands = Seq(',', ';', '\t', '|')
        val delim = cands(r.v % 4)
        val trap = cands((r.v + 1) % 4)
        val k = 3 + r.n % 5
        val rows = (0 until k).map { j =>
          val f1 = "x" + trap +
            ('a' + (r.v + j) % 26).toChar.toString * (1 + (r.n + j) % 4)
          val f2 =
            if (j == 1) "q\"z"
            else ('a' + (r.n + j) % 26).toChar.toString * (1 + (r.v + j) % 5)
          Seq(s"r$j", f1, f2)
        }
        val text = CsvDialect.render(rows, delim)
        val d = CsvDialect.infer(text)
          .getOrElse(sys.error(s"inference failed: doc ${r.doc_id}"))
        require(d.delimiter == delim, s"wrong dialect: doc ${r.doc_id}")
        val parsed = CsvDialect.parse(text, d.delimiter)
          .getOrElse(sys.error(s"parse failed: doc ${r.doc_id}"))
        require(parsed == rows.map(_.toVector).toVector,
          s"round trip drift: doc ${r.doc_id}")
        val name = Seq("comma", "semi", "tab", "pipe")(r.v % 4)
        (r.doc_id, name, d.nFields, d.nRecords, d.anyQuoted,
          parsed.head(1), parsed(1)(2), text.length.toLong)
      }
      probed.toDF("doc_id", "dialect", "n_fields", "n_records",
          "any_quoted", "first_f1", "quoted_cell", "text_chars")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 3 + n % 5 AS k FROM d),
      t AS (SELECT *,
                   -- row j: "rj"(2) + d + f1 UNQUOTED (the trap char is a
                   -- DIFFERENT delimiter: 2 + 1+(n+j)%4) + d + f2 (6 quoted
                   -- when j=1, else 1+(v+j)%5)
                   list_sum(list_transform(range(k), j ->
                     2 + 1 + (3 + (n + j) % 4) + 1 +
                     (CASE WHEN j = 1 THEN 6 ELSE 1 + (v + j) % 5 END)))
                   + (k - 1) AS chars
            FROM g)
      SELECT doc_id,
             ['comma', 'semi', 'tab', 'pipe'][v % 4 + 1] AS dialect,
             CAST(3 AS INTEGER) AS n_fields,
             CAST(k AS INTEGER) AS n_records,
             TRUE AS any_quoted,
             'x' || [',', ';', chr(9), '|'][(v + 1) % 4 + 1]
               || repeat(chr(97 + v % 26), 1 + n % 4) AS first_f1,
             'q"z' AS quoted_cell,
             CAST(chars AS BIGINT) AS text_chars
      FROM t ORDER BY doc_id"""))

  /** ROBOTS.TXT EVALUATION under the oracle gate — the politeness
    * gate a web corpus applies before fetching: per document, a real
    * robots.txt (a `*` group with prefix/wildcard rules and a
    * crawl-delay, a specific allow-all bot group on even hashes,
    * sitemap lines, comments) is parsed by
    * [[graft.operators.RobotsTxt.parse]] and a four-path battery is
    * evaluated for both a named bot and an anonymous crawler —
    * longest-match precedence, the Allow override inside a disallowed
    * prefix, the `*` wildcard rule, and group fallback all land in
    * the hash. The oracle replays every decision in closed form.
    */
  val q268RobotsTxt: QueryDef = QueryDef(
    "q268_robots_txt",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.RobotsTxt
        val c = ('a' + r.v % 26).toChar
        val hasBot = r.v % 2 == 0
        val delay = 1 + r.v % 9
        val txt = new StringBuilder()
          .append("# policy\n")
          .append("User-agent: *\n")
          .append("Disallow: /tmp/\n")
          .append("Allow: /tmp/pub\n")
          .append(s"Disallow: /$c*$c.bin\n")
          .append(s"Crawl-delay: $delay\n\n")
        if (hasBot) txt.append("User-agent: graftbot\nDisallow:\n\n")
        (0 until 1 + r.n % 2).foreach(i =>
          txt.append(s"Sitemap: https://ex.org/s$i.xml\n"))
        val robots = RobotsTxt.parse(txt.toString)
        val paths = Seq(s"/tmp/data${r.n % 10}", "/tmp/pub/x",
          s"/${c}dir/file$c.bin", "/open")
        def allowed(agent: String) =
          paths.map(p => RobotsTxt.isAllowed(robots, agent, p))
        val bot = allowed("graftbot")
        val rand = allowed("randombot")
        (r.doc_id, robots.groups.length, robots.nRules,
          RobotsTxt.groupFor(robots, "randombot")
            .flatMap(_.crawlDelay).getOrElse(-1L),
          robots.sitemaps.length,
          bot(0), rand(0), rand(1), bot(2), rand(2),
          bot.count(identity), rand.count(identity))
      }
      probed.toDF("doc_id", "n_groups", "n_rules", "crawl_delay",
          "n_sitemaps", "p1_bot", "p1_rand", "p2_rand", "p3_bot",
          "p3_rand", "n_allowed_bot", "n_allowed_rand")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS hasbot
            FROM d)
      SELECT doc_id,
             CAST(1 + hasbot AS INTEGER) AS n_groups,
             CAST(3 AS INTEGER) AS n_rules,
             CAST(1 + v % 9 AS BIGINT) AS crawl_delay,
             CAST(1 + n % 2 AS INTEGER) AS n_sitemaps,
             hasbot = 1 AS p1_bot,
             FALSE AS p1_rand,
             TRUE AS p2_rand,
             hasbot = 1 AS p3_bot,
             FALSE AS p3_rand,
             CAST(CASE WHEN hasbot = 1 THEN 4 ELSE 2 END AS INTEGER)
               AS n_allowed_bot,
             CAST(2 AS INTEGER) AS n_allowed_rand
      FROM g ORDER BY doc_id"""))

  /** SITEMAP XML under the oracle gate — the crawl frontier's seed
    * list, completing the q268 politeness pair: per document, a REAL
    * sitemaps.org file (a urlset of page entries, or a sitemapindex
    * on every fifth hash) with `&amp;` entities inside the loc URLs —
    * the classic trap: the query string `a=1&amp;b=2` must decode
    * before the URL is fetched or deduped — is rendered and parsed
    * back by [[graft.operators.Sitemap]]'s strict narrow-XML scanner.
    * The oracle rebuilds the DECODED URLs, the per-field presence
    * counts, and the exact rendered character count (entity encoding
    * overhead included) in closed form.
    */
  val q269Sitemap: QueryDef = QueryDef(
    "q269_sitemap",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.Sitemap
        import graft.operators.Sitemap.Entry
        val isIndex = r.v % 5 == 0
        val k = 2 + r.n % 5
        val entries = (0 until k).map { j =>
          val host = ('a' + (r.v + j) % 26).toChar
          val loc = s"https://$host.org/p$j?a=${r.n % 10}&b=$j"
          Entry(loc,
            if (j % 2 == 0) Some(f"2024-${1 + (r.v + j) % 12}%02d-01") else None,
            None,
            if (!isIndex && j == 0) Some("0." + (1 + r.v % 9)) else None)
        }
        val xml = Sitemap.render(isIndex, entries)
        val info = Sitemap.parse(xml)
          .getOrElse(sys.error(s"sitemap failed to parse: doc ${r.doc_id}"))
        require(info.entries.map(_.loc) == entries.map(_.loc).toVector,
          s"entity decode drift: doc ${r.doc_id}")
        (r.doc_id, info.isIndex, info.nEntries,
          info.entries.head.loc, info.entries.last.loc,
          info.entries.count(_.lastmod.nonEmpty),
          info.entries.flatMap(_.lastmod).headOption.orNull,
          info.entries.count(_.priority.nonEmpty),
          xml.length.toLong)
      }
      probed.toDF("doc_id", "is_index", "n_entries", "first_loc",
          "last_loc", "n_lastmod", "first_lastmod", "n_priority",
          "xml_chars")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END AS idx,
                   2 + n % 5 AS k
            FROM d),
      -- rendered char arithmetic (all incl. the newline): decl 39;
      -- root open 61 (urlset) / 67 (sitemapindex); root close 10/16;
      -- per entry: open+close lines 11 + 2*len(tag); loc line 16 +
      -- encoded loc (the one &amp; adds 4); lastmod line 34;
      -- priority line 29
      t AS (SELECT *,
                   CASE WHEN idx = 1 THEN 7 ELSE 3 END AS taglen,
                   list_sum(list_transform(range(k), j ->
                     -- loc raw: https:// 8 + host 1 + .org/p 6 + len(j)
                     -- + ?a= 3 + digit 1 + &b= 3 + len(j)
                     22 + 2 * len(CAST(j AS VARCHAR)))) AS locraw,
                   list_sum(list_transform(range(k), j ->
                     CASE WHEN j % 2 = 0 THEN 1 ELSE 0 END)) AS nlm
            FROM g)
      SELECT doc_id,
             idx = 1 AS is_index,
             CAST(k AS INTEGER) AS n_entries,
             'https://' || chr(97 + v % 26) || '.org/p0?a='
               || CAST(n % 10 AS VARCHAR) || '&b=0' AS first_loc,
             'https://' || chr(97 + (v + k - 1) % 26) || '.org/p'
               || CAST(k - 1 AS VARCHAR) || '?a=' || CAST(n % 10 AS VARCHAR)
               || '&b=' || CAST(k - 1 AS VARCHAR) AS last_loc,
             CAST((k + 1) // 2 AS INTEGER) AS n_lastmod,
             '2024-' || CASE WHEN (v % 12) + 1 < 10 THEN '0' ELSE '' END
               || CAST((v % 12) + 1 AS VARCHAR) || '-01' AS first_lastmod,
             CAST(1 - idx AS INTEGER) AS n_priority,
             CAST(39 + (CASE WHEN idx = 1 THEN 67 + 16 ELSE 61 + 10 END)
                  + k * (11 + 2 * taglen)
                  + k * 16 + locraw + 4 * k
                  + nlm * 34
                  + (1 - idx) * 29 AS BIGINT) AS xml_chars
      FROM t ORDER BY doc_id"""))

  /** PERCENT-ENCODING NORMALIZATION under the oracle gate — the RFC
    * 3986 §6.2.2 step that makes `%7Euser`, `%7euser`, and `~user`
    * dedupe as one URL: per document, a URL carrying an unreserved
    * escape in both hex cases, an ALPHA escape, a reserved escape in
    * the wrong case, and an INVALID escape runs through the codegen'd
    * [[graft.plans.PercentNormalize]] expression in the plan. The
    * oracle rebuilds the normalized string in closed form — unreserved
    * escapes decoded, the reserved escape's hex uppercased, the
    * invalid escape untouched — so each rule's boundary lands in the
    * hash.
    */
  val q270PercentNormalize: QueryDef = QueryDef(
    "q270_percent_normalize",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val urls = src.map { r =>
        val h = ('a' + r.v % 26).toChar
        val e = if (r.n % 2 == 0) 'E' else 'e'
        val hd = ('1' + r.v % 9).toChar
        val f = if (r.v % 2 == 0) 'f' else 'F'
        (r.doc_id, s"https://$h.org/%7${e}dir/p%4$hd?q=%2$f&bad=%G1")
      }.toDF("doc_id", "url")
      urls
        .select(col("doc_id"), col("url"),
          graft.plans.PercentNormalize(col("url")).as("normalized"))
        .select(col("doc_id"), col("normalized"),
          (col("normalized") =!= col("url")).as("changed"),
          length(col("url")).cast("int").as("raw_chars"),
          length(col("normalized")).cast("int").as("norm_chars"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   'https://' || chr(97 + v % 26) || '.org/~dir/p'
                     || chr(65 + v % 9) || '?q=%2F&bad=%G1' AS norm,
                   -- raw: the two decoded escapes add 2 chars each back
                   26 + 14 + 4 AS rawlen
            FROM d)
      SELECT doc_id,
             norm AS normalized,
             TRUE AS changed,
             CAST(length(norm) + 4 AS INTEGER) AS raw_chars,
             CAST(length(norm) AS INTEGER) AS norm_chars
      FROM g ORDER BY doc_id"""))

  /** PARQUET V2 DATA PAGES under the oracle gate — the other page
    * generation after q255's v1: the documents table is written by
    * Spark's parquet-mr under `parquet.writer.version=v2` with
    * dictionaries OFF (the memoized
    * [[graft.sources.CompressedIngest.documentsParquetV2]] dump), so
    * the data pages carry the DELTA encodings — DELTA_BINARY_PACKED
    * block/miniblock bit-packed ints and DELTA_BYTE_ARRAY front-coded
    * strings — with definition levels OUTSIDE the snappy-compressed
    * span (the v2 layout change). Every written file's columns decode
    * through [[graft.operators.ParquetPages.readColumn]] and the
    * decoded values' aggregates face plain SQL over the same table.
    */
  val q271ParquetV2: QueryDef = QueryDef(
    "q271_parquet_v2_pages",
    (s, dir) => {
      import s.implicits._
      graft.sources.CompressedIngest.documentsParquetV2(s, dir)
      val path = graft.sources.CompressedIngest.dumpPath(dir, "parquet_v2")
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet").load(path)
        .select(col("content")).as[Array[Byte]]
      val perFile = files.map { bytes =>
        import graft.operators.{ParquetFooter, ParquetPages}
        import graft.operators.ParquetPages.{PBin, PLong}
        val f = ParquetFooter.probe(bytes)
          .getOrElse(sys.error("v2 footer probe failed"))
        def col(name: String) = ParquetPages.readColumn(bytes,
          f.firstGroupChunks.find(_.pathInSchema == name)
            .getOrElse(sys.error(s"no chunk $name")))
          .getOrElse(sys.error(s"v2 page decode failed: $name"))
        val ids = col("doc_id").flatten.collect { case PLong(v) => v }
        val texts = col("text").flatten.collect { case p: PBin => p.v }
        require(ids.length.toLong == f.numRows, "v2 row count drift")
        (ids.length.toLong, ids.sum,
          if (ids.isEmpty) Long.MaxValue else ids.min,
          if (ids.isEmpty) Long.MinValue else ids.max,
          texts.map(_.length.toLong).sum)
      }.toDF("rows", "idsum", "idmin", "idmax", "textbytes")
      perFile.agg(sum("rows").as("n_rows"), sum("idsum").as("id_sum"),
        min("idmin").as("id_min"), max("idmax").as("id_max"),
        sum("textbytes").as("text_bytes"))
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(doc_id) AS BIGINT) AS id_sum,
             CAST(min(doc_id) AS BIGINT) AS id_min,
             CAST(max(doc_id) AS BIGINT) AS id_max,
             CAST(sum(octet_length(encode(text))) AS BIGINT) AS text_bytes
      FROM documents"""))

  /** DPO PREFERENCE PAIRS under the oracle gate — the RLHF data-prep
    * step after q264's SFT: per document, two completions sharing a
    * common prefix score against each other, the pair orders so
    * `chosen` carries the higher score (ties keep the first —
    * deterministic), both render through the q264 template, and the
    * SHARED RENDERED PREFIX — the span a trainer's KV cache reuses
    * across the pair — is measured character-exactly
    * ([[graft.operators.SftFormat.preferencePair]]). The oracle
    * rebuilds the swap decision, the margin, both rendered lengths,
    * and the common-prefix arithmetic (prompt turn + assistant header
    * + the constructed shared span) in closed form.
    */
  val q272PreferencePairs: QueryDef = QueryDef(
    "q272_preference_pairs",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.SftFormat
        import graft.operators.SftFormat.Turn
        val promptTxt = "ask " +
          ('a' + r.n % 26).toChar.toString * (2 + r.v % 6)
        val shared = ('a' + r.v % 26).toChar.toString * (3 + r.n % 5)
        val respA = shared + "a" * (1 + r.v % 4)
        val respB = shared + "b" * (1 + r.n % 4)
        val sa = (r.v % 100).toLong
        val sb = ((r.v * 7 + r.n) % 100).toLong
        val pair = SftFormat.preferencePair(
          Seq(Turn("user", promptTxt)), respA, sa, respB, sb)
        (r.doc_id, pair.swapped, pair.margin,
          pair.chosen.length.toLong, pair.rejected.length.toLong,
          pair.commonPrefix,
          pair.chosen.endsWith("a<|im_end|>\n"))
      }
      probed.toDF("doc_id", "swapped", "margin", "chosen_chars",
          "rejected_chars", "common_prefix", "chose_a")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   4 + (2 + v % 6) AS plen,
                   3 + n % 5 AS sh,
                   1 + v % 4 AS ta,
                   1 + n % 4 AS tb,
                   v % 100 AS sa,
                   (v * 7 + n) % 100 AS sb
            FROM d),
      -- rendered turn = 12 + role + 1 + content + 10 + 1;
      -- prompt turn (user) = 28 + plen; assistant turn = 33 + resp
      t AS (SELECT *,
                   CASE WHEN sb > sa THEN 1 ELSE 0 END AS sw,
                   28 + plen AS prompt_chars
            FROM g)
      SELECT doc_id,
             sw = 1 AS swapped,
             CAST(abs(sa - sb) AS BIGINT) AS margin,
             CAST(prompt_chars + 33 + sh +
               (CASE WHEN sw = 1 THEN tb ELSE ta END) AS BIGINT)
               AS chosen_chars,
             CAST(prompt_chars + 33 + sh +
               (CASE WHEN sw = 1 THEN ta ELSE tb END) AS BIGINT)
               AS rejected_chars,
             CAST(prompt_chars + 22 + sh AS INTEGER) AS common_prefix,
             sw = 0 AS chose_a
      FROM t ORDER BY doc_id"""))

  /** COMPRESSED ARROW BODIES under the oracle gate — q261's reader
    * against the two spec codecs: per document, the Arrow Java
    * library writes the record batch with LZ4_FRAME, ZSTD, or no
    * compression (doc-chosen), and
    * [[graft.operators.ArrowIpc.probe]] decodes the per-buffer
    * 8-byte-length-prefixed compressed form (commons-compress LZ4
    * frames / zstd-jni, both shipped with Spark). The oracle is
    * codec-blind by construction — identical decoded values must come
    * out of all three forms — which is exactly the invariant that
    * catches a buffer mis-sliced against its uncompressed length.
    */
  val q273ArrowCompressed: QueryDef = QueryDef(
    "q273_arrow_compressed",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import org.apache.arrow.vector.{BigIntVector, VarCharVector}
        import org.apache.arrow.vector.compression.CompressionUtil
        import org.apache.arrow.vector.ipc.ArrowFileWriter
        import org.apache.arrow.vector.ipc.message.IpcOption
        import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
        import graft.operators.{ArrowIpc, ArrowSynth}
        import graft.operators.ArrowIpc.{ALong, AStr}
        // ONE allocator + root per PARTITION (ArrowSynth) — the per-row
        // codec choice only swaps the (cheap) writer, never the allocator
        val schema = new Schema(java.util.Arrays.asList(
          new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
          new Field("txt", FieldType.nullable(new ArrowType.Utf8()), null)))
        ArrowSynth.mapWithRootAndBuffer(rows, schema) { (r, root, out) =>
          val k = 10 + r.n % 20
          val codecName = Seq("lz4", "zstd", "none")(r.v % 3)
          val w = codecName match {
            case "none" =>
              new ArrowFileWriter(root, null,
                java.nio.channels.Channels.newChannel(out))
            case c =>
              // graft's factory: lz4-java for LZ4_FRAME (the stock
              // commons-compress encoder costs 3.2 ms per tiny batch —
              // q273's whole cold-path residual), zstd-jni for ZSTD
              new ArrowFileWriter(root, null,
                java.nio.channels.Channels.newChannel(out),
                new java.util.HashMap[String, String](), IpcOption.DEFAULT,
                graft.operators.ArrowCompression.Factory,
                if (c == "lz4") CompressionUtil.CodecType.LZ4_FRAME
                else CompressionUtil.CodecType.ZSTD)
          }
          w.start()
          val idv = root.getVector("id").asInstanceOf[BigIntVector]
          val tv = root.getVector("txt").asInstanceOf[VarCharVector]
          (0 until k).foreach { j =>
            if (j == 1) idv.setNull(j)
            else idv.setSafe(j, ((r.v + j) % 90).toLong)
            tv.setSafe(j,
              (('a' + (r.n + j) % 26).toChar.toString * (2 + (r.v + j) % 6))
                .getBytes("UTF-8"))
          }
          root.setRowCount(k)
          w.writeBatch()
          w.end(); w.close()
          val bytes = out.toByteArray
          val info = ArrowIpc.probe(bytes)
            .getOrElse(sys.error(s"arrow $codecName decode failed: doc ${r.doc_id}"))
          val ids = info.columns(0)
          val txts = info.columns(1).flatten.collect { case AStr(s2) => s2 }
          require(ids(1).isEmpty, s"null slot drift: doc ${r.doc_id}")
          (r.doc_id, codecName, info.nRows,
            ids.flatten.collect { case ALong(x) => x }.sum,
            txts.map(_.length.toLong).sum, txts.head, txts.last)
        }
      }
      probed.toDF("doc_id", "codec", "n_rows", "id_sum", "txt_chars",
          "first_txt", "last_txt")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 10 + n % 20 AS k FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(k), j ->
                     CASE WHEN j = 1 THEN 0 ELSE (v + j) % 90 END)) AS idsum,
                   list_sum(list_transform(range(k), j ->
                     2 + (v + j) % 6)) AS tchars
            FROM g)
      SELECT doc_id,
             ['lz4', 'zstd', 'none'][v % 3 + 1] AS codec,
             CAST(k AS BIGINT) AS n_rows,
             CAST(idsum AS BIGINT) AS id_sum,
             CAST(tchars AS BIGINT) AS txt_chars,
             repeat(chr(97 + n % 26), 2 + v % 6) AS first_txt,
             repeat(chr(97 + (n + k - 1) % 26), 2 + (v + k - 1) % 6) AS last_txt
      FROM t ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q246TarLongNames, q247Id3v22, q248Mp4SyncCo64, q249FlacSeekPicture,
      q250OggMux, q251VttDocModel, q252RepetitionSignals,
      q253ParquetFooterProbe, q254AvroOcf, q255ParquetPages, q256Utf8Scrub,
      q257NfcNormalize, q258OrcFooter, q259TfRecord, q260ZstdFrames,
      q261ArrowIpc, q262DeltaReplay, q263DeltaReplayStream,
      q264SftFormat, q265Id3Unsync, q266Mp4Stsc, q267CsvDialect,
      q268RobotsTxt, q269Sitemap, q270PercentNormalize,
      q271ParquetV2, q272PreferencePairs, q273ArrowCompressed)
}
