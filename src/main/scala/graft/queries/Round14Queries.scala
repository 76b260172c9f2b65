package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 additions: video keyframe byte-range extraction — the ranged
  * read a video pipeline runs to pull GOP heads out of MP4s without a
  * decoder in the loop (the r13 verdict's task #8).
  */
object Round14Queries {

  /** KEYFRAME BYTE-RANGE EXTRACTION under the oracle gate — the video
    * analogue of the audio/image decode legs: per document a VALID MP4
    * is synthesized whose video track carries per-sample sizes (stsz), a
    * multi-run sample-to-chunk table (stsc: a fat first chunk, then
    * 2-sample chunks), chunk offsets that point at the REAL sample bytes
    * inside mdat (stco, or co64 on even hashes), and an stss keyframe
    * table (samples ≡ 1 mod 3). [[graft.operators.Mp4Boxes.keyframeByteRanges]]
    * then performs the stss→stsc/stsz/stco walk and the query RANGED-READS
    * each keyframe's bytes out of the file, folding their actual values
    * into a content checksum — so a chunk resolved off by one run, an
    * intra-chunk prefix summed over the wrong samples, or a co64 misread
    * all land in the hash, not just in a count. The oracle recomputes the
    * whole geometry closed-form from the deterministic fill. One synth +
    * extract per ROW, map-only until the display sort — no shuffle, no
    * decoder, which is exactly why this scales to a 100 TB video corpus:
    * each task reads byte ranges of its own files.
    */
  val q345KeyframeExtract: QueryDef = QueryDef(
    "q345_keyframe_extract",
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
        val m = 2 + r.n % 4 // trailing 2-sample chunks
        val c1 = 3 + r.v % 3 // samples in the fat first chunk
        val ns = c1 + 2 * m // 7..13 samples
        val nC = 1 + m
        def sz(idx0: Int): Long = 5L + (r.v + 3 * idx0) % 12
        val prefix = new Array[Long](ns + 1) // prefix(i) = Σ sz(<i)
        (0 until ns).foreach(i => prefix(i + 1) = prefix(i) + sz(i))
        def chunkStart(k: Int): Int = if (k == 0) 0 else c1 + 2 * (k - 1)
        // 2-byte gap before each chunk, chunks tiled in sample order
        val relOffs = (0 until nC).map(k => 2L * (k + 1) + prefix(chunkStart(k)))
        val syncs = (1 to ns by 3).map(_.toLong)
        val mdatLen = (prefix(ns) + 2 * nC + 3).toInt
        val vt = SynthTrack(1, "vide", "avc1", 640, 360, 600,
          ns.toLong * 100, "eng",
          sttsEntries = Seq((ns.toLong, 100L)),
          sizes = Some(Right((0 until ns).map(sz))),
          chunks = nC,
          useCo64 = r.v % 2 == 0,
          syncSamples = syncs,
          stscRuns = Seq((1L, c1.toLong), (2L, 2L)),
          chunkOffsetsRelMdat = Some(relOffs))
        val bytes = Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600,
          ns.toLong * 100, Seq(vt), mdatLen, i => (i * 7 + r.v) % 256)
        val ranges = Mp4Boxes.keyframeByteRanges(bytes)
          .getOrElse(sys.error(s"keyframe walk failed: doc ${r.doc_id}"))
        require(ranges.map(_.sample) == syncs.toVector,
          s"sync set drift: doc ${r.doc_id}")
        val mdatStart = bytes.length - mdatLen
        var kfBytes = 0L
        var relSum = 0L
        var contentSum = 0L
        ranges.foreach { kr =>
          kfBytes += kr.size
          relSum += kr.offset - mdatStart
          var j = 0L
          while (j < kr.size) { // the RANGED READ: real bytes, summed
            contentSum += bytes((kr.offset + j).toInt) & 0xff
            j += 1
          }
        }
        (r.doc_id, ns.toLong, nC, ranges.length.toLong,
          ranges.last.sample, kfBytes, relSum, contentSum)
      }
      probed.toDF("doc_id", "n_samples", "n_chunks", "n_keyframes",
          "last_sync", "kf_bytes", "kf_reloff_sum", "kf_content_sum")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 2 + n % 4 AS m, 3 + v % 3 AS c1 FROM d),
      t AS (SELECT *, c1 + 2 * m AS ns, 1 + m AS nc FROM g),
      u AS (SELECT *,
                   list_transform(range(ns), i -> 5 + (v + 3 * i) % 12) AS szs
            FROM t),
      k AS (SELECT doc_id, ns, nc, v, c1, szs, unnest(
              list_transform(range((ns + 2) // 3), tt -> 1 + 3 * tt)) AS s
            FROM u),
      r AS (SELECT doc_id, ns, nc, v, s, szs[s] AS sz,
                   2 * (CASE WHEN s - 1 < c1 THEN 1
                             ELSE 2 + (s - 1 - c1) // 2 END)
                     + COALESCE(list_sum(szs[1 : s - 1]), 0) AS reloff
            FROM k),
      q AS (SELECT doc_id, ns, nc, s, sz, reloff,
                   list_sum(list_transform(range(sz),
                     j -> ((reloff + j) * 7 + v) % 256)) AS csum
            FROM r)
      SELECT doc_id, CAST(ns AS BIGINT) AS n_samples,
             CAST(nc AS INTEGER) AS n_chunks,
             CAST(count(*) AS BIGINT) AS n_keyframes,
             CAST(max(s) AS BIGINT) AS last_sync,
             CAST(sum(sz) AS BIGINT) AS kf_bytes,
             CAST(sum(reloff) AS BIGINT) AS kf_reloff_sum,
             CAST(sum(csum) AS BIGINT) AS kf_content_sum
      FROM q GROUP BY doc_id, ns, nc ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q345KeyframeExtract)
}
