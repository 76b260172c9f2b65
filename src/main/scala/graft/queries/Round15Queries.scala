package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{Dedup, Mp4Boxes}

/** Round-15 additions: the VIDEO near-dup leg — a per-document video
  * fingerprint built from q345's keyframe byte-range extraction (real
  * ISO-BMFF walk + ranged reads, no decoder), banded with the same
  * four-16-bit-band pigeonhole join the text/image/audio families use,
  * and fed into the cross-modal consensus (q344, video=8).
  */
object Round15Queries {

  /** The keyframe-gradient fingerprint table (doc_id, sim64) — the video
    * analogue of [[Round13Queries4.audioHashTable]], with the REAL MP4
    * machinery in the loop: per document a VALID MP4 is synthesized whose
    * geometry (sample sizes, fat-first-chunk stsc, stco/co64 into real
    * mdat bytes, stss every 3rd sample) is keyed by the doc's GROUP
    * g = v%50 and whose mdat bytes carry a quadratic fill plus a
    * CLASS-keyed saturation (c = n%3: two keyframe bytes at c=1, four at
    * c=2 — written INTO THE FILE via the fill override, not patched after
    * reading). [[graft.operators.Mp4Boxes.keyframeByteRanges]] performs
    * the stss→stsc/stsz/stco walk, the query RANGED-READS each keyframe's
    * bytes, and the first 130 concatenated keyframe bytes hash to 64 bits
    * of 2-byte-frame energy gradient — the q341 shape, one modality over.
    * Same-group classes land 0–6 apart (≤2 keeps the planted near-dups);
    * offline validation over all 150 (g, c) cells: min cross-group
    * Hamming 16, zero cross-group pairs survive band + filter. One synth
    * + walk + ranged read per ROW, map-only — each task reads byte
    * ranges of its own files, which is why this scales to a 100 TB
    * video corpus.
    */
  private[queries] def videoHashTable(s: org.apache.spark.sql.SparkSession,
      dir: String,
      where: org.apache.spark.sql.Column = lit(true)): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // `where` lands BELOW the opaque per-row synth map (a typed map blocks
    // filter pushdown), so an index probe fingerprints only its own split
    // instead of synthesizing the whole corpus and discarding 4/5 of it
    val src = Tables.load(s, dir, "documents")
      .filter(where)
      .select(col("doc_id"),
        octet_length(col("text")).cast("int").as("n"),
        pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
      .as[Round5Queries6.MediaSrc]
    src.map { r =>
      import graft.operators.Mp4Boxes.SynthTrack
      val g = r.v % 50
      val c = r.n % 3
      val c1 = 3 + g % 3 // samples in the fat first chunk
      val m = 15 // trailing 2-sample chunks
      val ns = c1 + 2 * m // 33..35 samples
      val nC = 1 + m
      def sz(i0: Int): Long = 12L + (g + 3 * i0) % 5 // 12..16 bytes
      val prefix = new Array[Long](ns + 1) // prefix(i) = Σ sz(<i)
      (0 until ns).foreach(i => prefix(i + 1) = prefix(i) + sz(i))
      def chunkStart(k: Int): Int = if (k == 0) 0 else c1 + 2 * (k - 1)
      // 2-byte gap before each chunk, chunks tiled in sample order (the
      // q345 layout) — so reloff(sample s0) = 2*(chunk+1) + prefix(s0)
      val relOffs = (0 until nC).map(k => 2L * (k + 1) + prefix(chunkStart(k)))
      val syncs = (1 to ns by 3).map(_.toLong) // ≥ 11 keyframes
      val mdatLen = (prefix(ns) + 2 * nC + 3).toInt
      def base(p: Long): Int = { // quadratic fill — decorrelates groups
        val x = (g + 1).toLong * 521L + (p + 1).toLong * 1031L
        (x * x % 99991L % 251L).toInt
      }
      // keyframe-byte index t -> mdat-relative position, for the class
      // saturation overrides (written INTO the file)
      val kfPositions = scala.collection.mutable.ArrayBuffer.empty[Long]
      syncs.foreach { sIdx =>
        val s0 = (sIdx - 1).toInt
        val k = if (s0 < c1) 0 else 1 + (s0 - c1) / 2
        val ro = 2L * (k + 1) + prefix(s0)
        (0L until sz(s0)).foreach(j => kfPositions += ro + j)
      }
      val perturbT: Seq[Int] = c match {
        case 1 => Seq(40, 41)
        case 2 => Seq(20, 21, 80, 81)
        case _ => Nil
      }
      val overrides: Map[Long, Int] =
        perturbT.filter(_ < kfPositions.length)
          .map(t => kfPositions(t) -> 250).toMap
      val vt = SynthTrack(1, "vide", "avc1", 640, 360, 600,
        ns.toLong * 100, "eng",
        sttsEntries = Seq((ns.toLong, 100L)),
        sizes = Some(Right((0 until ns).map(sz))),
        chunks = nC,
        useCo64 = g % 2 == 0,
        syncSamples = syncs,
        stscRuns = Seq((1L, c1.toLong), (2L, 2L)),
        chunkOffsetsRelMdat = Some(relOffs))
      val bytes = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600,
        ns.toLong * 100, Seq(vt), mdatLen,
        i => overrides.getOrElse(i.toLong, base(i.toLong)))
      val ranges = Mp4Boxes.keyframeByteRanges(bytes)
        .getOrElse(sys.error(s"keyframe walk failed: doc ${r.doc_id}"))
      require(ranges.map(_.sample) == syncs.toVector,
        s"sync set drift: doc ${r.doc_id}")
      // the RANGED READS: first 130 concatenated keyframe bytes
      val kb = new Array[Int](130)
      var t = 0
      ranges.foreach { kr =>
        var j = 0L
        while (j < kr.size && t < 130) {
          kb(t) = bytes((kr.offset + j).toInt) & 0xff
          t += 1
          j += 1
        }
      }
      require(t == 130, s"keyframe byte stream too short: doc ${r.doc_id}")
      val e = Array.tabulate(65) { j =>
        kb(2 * j).toLong * kb(2 * j) + kb(2 * j + 1).toLong * kb(2 * j + 1)
      }
      var h = 0L
      (0 until 64).foreach(j => if (e(j + 1) > e(j)) h |= 1L << j)
      (r.doc_id, h)
    }.toDF("doc_id", "sim64")
  }

  /** Oracle CTE chain producing `vcand(doc_a, doc_b, alo, ahi, blo, bhi)`
    * — the closed-form video-fingerprint banded candidates (names
    * prefixed `v*` so the chain composes with the text/image/audio
    * chains in q344). The keyframe-byte inverse lookup (byte index t →
    * keyframe kk) is `len(list_filter(kfstart, st -> st <= t))` over the
    * cumulative keyframe-size list — pure list lambdas, one row per doc.
    */
  private[queries] def videoCandCtes: String =
    s"""$videoBandCtes,
    vcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
             FROM vbx a JOIN vbx b
               ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)"""

  /** The chain up to the banded rows `vbx(doc_id, lo, hi, j, bv)` — shared
    * by the self-join candidates above and q347's history/new split probe.
    */
  private[queries] def videoBandCtes: String =
    """vd AS (SELECT doc_id,
                      CAST(octet_length(encode(text)) AS INTEGER) % 3 AS c,
                      CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                        AS INTEGER) % 50 AS g
               FROM documents),
    vg AS (SELECT doc_id, c, g, 3 + g % 3 AS c1, 33 + g % 3 AS ns FROM vd),
    vu AS (SELECT *,
                  list_transform(range(ns), i -> 12 + (g + 3 * i) % 5) AS szs,
                  (ns + 2) // 3 AS nkf
           FROM vg),
    vk AS (SELECT *,
                  list_transform(range(nkf), kk ->
                    CASE WHEN 3 * kk < c1 THEN 1
                         ELSE 2 + (3 * kk - c1) // 2 END) AS kfk,
                  list_transform(range(nkf), kk -> szs[3 * kk + 1]) AS kfsz,
                  list_transform(range(nkf), kk ->
                    COALESCE(list_sum(szs[1 : 3 * kk]), 0)) AS kfpfx
           FROM vu),
    vo AS (SELECT doc_id, c, g, nkf, kfsz,
                  list_transform(range(nkf), kk ->
                    2 * kfk[kk + 1] + kfpfx[kk + 1]) AS kfoff
           FROM vk),
    vs AS (SELECT doc_id, c, g, kfoff,
                  list_transform(range(nkf), kk ->
                    COALESCE(list_sum(kfsz[1 : kk]), 0)) AS kfstart
           FROM vo),
    vb AS (SELECT doc_id,
                  list_transform(range(130), t ->
                    CASE WHEN (c = 1 AND (t = 40 OR t = 41))
                           OR (c = 2 AND (t = 20 OR t = 21 OR t = 80
                                          OR t = 81)) THEN 250
                         ELSE (((g + 1) * 521
                                + (kfoff[len(list_filter(kfstart, st -> st <= t))]
                                   + t - kfstart[len(list_filter(kfstart, st -> st <= t))]
                                   + 1) * 1031)
                               * ((g + 1) * 521
                                  + (kfoff[len(list_filter(kfstart, st -> st <= t))]
                                     + t - kfstart[len(list_filter(kfstart, st -> st <= t))]
                                     + 1) * 1031))
                              % 99991 % 251 END) AS kb
           FROM vs),
    ve AS (SELECT doc_id,
                  list_transform(range(0, 65), j ->
                    kb[2 * j + 1] * kb[2 * j + 1]
                    + kb[2 * j + 2] * kb[2 * j + 2]) AS e
           FROM vb),
    vh AS (SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 32), j ->
                   CASE WHEN e[j + 2] > e[j + 1] THEN 1::BIGINT << j
                        ELSE 0::BIGINT END)) AS BIGINT) AS lo,
                 CAST(list_sum(list_transform(range(32, 64), j ->
                   CASE WHEN e[j + 2] > e[j + 1] THEN 1::BIGINT << (j - 32)
                        ELSE 0::BIGINT END)) AS BIGINT) AS hi
          FROM ve),
    vbx AS (SELECT doc_id, lo, hi, u.j,
                   CASE u.j WHEN 0 THEN lo & 65535
                            WHEN 1 THEN (lo >> 16) & 65535
                            WHEN 2 THEN hi & 65535
                            ELSE (hi >> 16) & 65535 END AS bv
            FROM vh, unnest([0, 1, 2, 3]) AS u(j))"""

  /** VIDEO FINGERPRINT NEAR-DUP — q341's perceptual dedup in the video
    * modality: banded pairs over [[videoHashTable]] at Hamming ≤ 2. The
    * oracle recomputes the fingerprint closed-form from the synth
    * geometry (chunk layout, keyframe selection, fill, class saturation)
    * and mirrors the banded join — a chunk resolved off by one run, a
    * co64 misread, or a band split off by one all land in the hash.
    */
  val q346VideoFingerprint: QueryDef = QueryDef(
    "q346_video_fingerprint",
    (s, dir) => Dedup.banded64Pairs(videoHashTable(s, dir), maxHamming = 2)
      .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $videoCandCtes
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
               AS INTEGER) AS hamming
      FROM vcand
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2
      ORDER BY doc_a, doc_b"""))

  val all: Seq[QueryDef] = Seq(q346VideoFingerprint)
}
