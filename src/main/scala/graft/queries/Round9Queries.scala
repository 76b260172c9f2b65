package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 surface, first tranche: the cleaned-corpus MATERIALIZATION —
  * q215 planned which duplicate spans to remove; q217 actually removes
  * them and ships the spliced text, pinned by an md5 over the result.
  */
object Round9Queries {

  /** CLEANED-CORPUS SPLICE, keep-first policy: every corpus-wide duplicate
    * 20-char window occurrence except the first is removed from the actual
    * text ([[graft.operators.Dedup.removeDupSpans]]): merged intervals from
    * the q215 plan, then a per-doc fold concatenating the kept segments.
    * The oracle reproduces the whole chain independently — the wrapping-
    * 64-bit Rabin–Karp hash (q135's HUGEINT protocol), the lexicographic
    * first-occurrence exemption, the interval merge, and the splice itself
    * (string_agg over the complement segments) — so a span dropped from
    * the wrong side, an off-by-one interval bound, or a lost tail segment
    * all land in the md5/length comparison. `chars_removed` additionally
    * cross-checks the splice against q215's lead-difference coverage
    * identity (doc_len − clean_len must equal the merged coverage).
    */
  val q217CleanCorpus: QueryDef = QueryDef(
    "q217_clean_corpus",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.Dedup.removeDupSpans(docs, winLen = 20)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("doc_len"),
          length(col("clean_text")).cast("long").as("clean_len"),
          md5(col("clean_text").cast("binary")).as("clean_md5"),
          col("n_spans").cast("long").as("n_spans"),
          (length(col("text")) - length(col("clean_text")))
            .cast("long").as("chars_removed"))
        .orderBy("doc_id")
    },
    Some("""
      WITH pos AS (
        SELECT doc_id, text, unnest(generate_series(1, len(text) - 19)) AS i
        FROM documents WHERE len(text) >= 20),
      raw AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, list_reduce(
                 list_transform(string_split(substr(text, i, 20), ''),
                                c -> CAST(ascii(c) AS HUGEINT)),
                 (acc, c) -> (acc * 1000003 + c)
                   % CAST(18446744073709551616 AS HUGEINT)) AS h
        FROM pos),
      grams AS (
        SELECT doc_id, pos,
               CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
                         THEN h - CAST(18446744073709551616 AS HUGEINT)
                         ELSE h END AS BIGINT) AS gh
        FROM raw),
      firsts AS (
        SELECT gh, min([doc_id, pos]) AS f
        FROM grams GROUP BY gh HAVING count(*) >= 2),
      removable AS (
        SELECT g.doc_id, g.pos
        FROM grams g JOIN firsts ON g.gh = firsts.gh
        WHERE NOT (g.doc_id = f[1] AND g.pos = f[2])),
      grp0 AS (
        SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER w IS NULL
                      OR pos - lag(pos) OVER w > 20 THEN 1 ELSE 0 END AS newgrp
        FROM removable WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      grp AS (
        SELECT doc_id, pos,
               sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM grp0),
      ivs AS (
        SELECT doc_id, g, min(pos) AS s, max(pos) + 20 AS e
        FROM grp GROUP BY doc_id, g),
      pieces AS (
        SELECT doc_id, s, e,
               lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS pe
        FROM ivs),
      spliced AS (
        SELECT p.doc_id,
               string_agg(substr(d.text, CAST(p.pe + 1 AS INTEGER),
                                 CAST(p.s - p.pe AS INTEGER)), '' ORDER BY p.s)
                 || substr(d.text, CAST(max(p.e) + 1 AS INTEGER)) AS clean,
               count(*) AS n_spans
        FROM pieces p JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY p.doc_id, d.text)
      SELECT d.doc_id,
             CAST(len(d.text) AS BIGINT) AS doc_len,
             CAST(len(coalesce(s.clean, d.text)) AS BIGINT) AS clean_len,
             md5(coalesce(s.clean, d.text)) AS clean_md5,
             CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(len(d.text) - len(coalesce(s.clean, d.text)) AS BIGINT)
               AS chars_removed
      FROM documents d LEFT JOIN spliced s ON d.doc_id = s.doc_id
      ORDER BY d.doc_id"""))

  private val AdpcmStepsSql: String =
    graft.operators.MediaCodecs.AdpcmStepTable.mkString("[", ", ", "]")

  /** IMA ADPCM audio decode — WAV format code 0x11, the 4-bit lossy
    * predictive format real speech/game lakes carry: per document, build a
    * one-block mono ADPCM WAV from an explicit (predictor, step-index,
    * 16-code) state minted closed-form from the doc
    * ([[graft.operators.MediaCodecs.encodeWavAdpcmRaw]]), then REALLY
    * decode it (the predictor/step state machine in
    * [[graft.operators.MediaCodecs.decodeWavPcm16]], via
    * [[graft.operators.Multimodal.decodeFeatures]]'s sniff chain) and emit
    * the q207 sample statistics. The oracle REPLAYS the public IMA state
    * machine in SQL — a recursive CTE stepping (pred, idx) through the
    * same 16 codes with the step/index tables as literals — so a wrong
    * step-size lookup, a missed clamp, a swapped nibble order, or a sign
    * slip all land in the hash. Every decode is pure integer, so the
    * comparison is exact, not tolerance-based.
    */
  val q216AdpcmDecode: QueryDef = QueryDef(
    "q216_adpcm_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val pred0 = (r.v * 9973) % 60000 - 30000
        val idx0 = r.v % 89
        val codes = Array.tabulate(16)(j => (r.v * 7 + j * 3) % 16)
        val bytes = graft.operators.MediaCodecs
          .encodeWavAdpcmRaw(8000, pred0, idx0, codes, blockAlign = 12)
        graft.operators.Multimodal.MediaRow(r.doc_id, bytes,
          graft.operators.Multimodal.MediaMeta("wav", bytes.length, 0L))
      }
      graft.operators.Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"),
          col("width").as("n_samples"), col("channels"),
          element_at(col("features"), 1).cast("long").as("sample_rate"),
          element_at(col("features"), 2).cast("long").as("first_sample"),
          element_at(col("features"), 3).cast("long").as("sum_samples"),
          element_at(col("features"), 4).cast("long").as("wsum_samples"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
        FROM documents),
      walk AS (
        SELECT doc_id, v, 0 AS j,
               CAST((v * 9973) % 60000 - 30000 AS INTEGER) AS pred,
               CAST(v % 89 AS INTEGER) AS idx
        FROM d
        UNION ALL
        SELECT doc_id, v, j + 1,
               CAST(least(32767, greatest(-32768, pred +
                 (CASE WHEN ((v * 7 + j * 3) % 16 & 8) != 0 THEN -1 ELSE 1 END) *
                 ( $AdpcmStepsSql[idx + 1] // 8
                 + CASE WHEN ((v * 7 + j * 3) % 16 & 1) != 0
                        THEN $AdpcmStepsSql[idx + 1] // 4 ELSE 0 END
                 + CASE WHEN ((v * 7 + j * 3) % 16 & 2) != 0
                        THEN $AdpcmStepsSql[idx + 1] // 2 ELSE 0 END
                 + CASE WHEN ((v * 7 + j * 3) % 16 & 4) != 0
                        THEN $AdpcmStepsSql[idx + 1] ELSE 0 END))) AS INTEGER),
               CAST(least(88, greatest(0,
                 idx + [-1, -1, -1, -1, 2, 4, 6, 8][((v * 7 + j * 3) % 16 & 7) + 1]))
                 AS INTEGER)
        FROM walk WHERE j < 16)
      SELECT doc_id,
             17 AS n_samples, 1 AS channels,
             CAST(8000 AS BIGINT) AS sample_rate,
             CAST(min(CASE WHEN j = 0 THEN pred END) AS BIGINT) AS first_sample,
             CAST(sum(pred) AS BIGINT) AS sum_samples,
             CAST(sum((j + 1) * pred) AS BIGINT) AS wsum_samples
      FROM walk GROUP BY doc_id ORDER BY doc_id"""))

  /** MPEG-1 AUDIO FRAME WALK (MP1/MP2/MP3 container decode) — per
    * document, synthesize a VALID multi-frame MPEG-1 stream (layer by
    * doc_id mod 3, sample rate by n mod 3, per-frame VBR bitrate indices
    * and padding bits, an ID3v2 prefix on every 5th doc and an ID3v1
    * trailer on every 7th), then REALLY walk it
    * ([[graft.operators.MpegFrames.probe]]: sync check, header field
    * decode, spec frame-size arithmetic, tag skips) and emit the stream
    * metadata a media lake's prober extracts. The oracle recomputes every
    * number from the spec tables in closed form — bitrate tables as
    * literals, frame bytes as the Layer-I slot arithmetic vs the II/III
    * byte form, duration as exact integer math — so a wrong table row, a
    * padding slip, or a mis-skipped tag all land in the hash (a one-byte
    * frame-size error desyncs the walk entirely: probe returns None and
    * the row nulls out). PCM for these payloads is EXPLICITLY out of
    * scope (see [[graft.operators.MpegFrames]] scaladoc) — the prober
    * supplies the container truth instead of fabricated samples.
    */
  val q218MpegFrameWalk: QueryDef = QueryDef(
    "q218_mpeg_frame_walk",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        val layer = 1 + (r.doc_id % 3).toInt
        val srIdx = r.n % 3
        val k = 2 + r.n % 4
        val frames = (0 until k).map(j =>
          (1 + (r.v + j) % 14, (r.n + j) % 2 == 0))
        val bytes = graft.operators.MpegFrames.synthStream(
          layer, srIdx, frames, (fi, j) => (fi * 7 + j * 13) % 251,
          id3v2Body = if (r.n % 5 == 0) 7 + r.v % 20 else -1,
          id3v1 = r.n % 7 == 0)
        val info = graft.operators.MpegFrames.probe(bytes)
          .getOrElse(sys.error(s"synthesized stream failed to probe: doc ${r.doc_id}"))
        (r.doc_id, info.layer, info.sampleRate, info.channels,
          info.nFrames, info.nSamples, info.durationMs,
          info.frames.map(_.bitrateKbps).sum.toLong,
          info.frames.count(_.padded), info.id3v2Bytes.toLong,
          info.id3v1, bytes.length.toLong)
      }
      probed.toDF("doc_id", "layer", "sample_rate", "channels", "n_frames",
          "n_samples", "duration_ms", "sum_kbps", "n_padded", "id3v2_bytes",
          "has_id3v1", "stream_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CAST(1 + doc_id % 3 AS INTEGER) AS layer,
                   [44100, 48000, 32000][n % 3 + 1] AS sr,
                   2 + n % 4 AS k
            FROM d),
      f AS (SELECT doc_id, layer, sr, k,
                   CASE WHEN layer = 1 THEN 384 ELSE 1152 END AS spf,
                   list_transform(range(k), j ->
                     [[32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
                      [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
                      [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
                     ][layer][(v + j) % 14 + 1]) AS kbps,
                   list_transform(range(k), j ->
                     CASE WHEN (n + j) % 2 = 0 THEN 1 ELSE 0 END) AS pads,
                   CASE WHEN n % 5 = 0 THEN 10 + 7 + v % 20 ELSE 0 END AS id3v2,
                   CASE WHEN n % 7 = 0 THEN 128 ELSE 0 END AS id3v1
            FROM g)
      SELECT doc_id,
             layer, CAST(sr AS INTEGER) AS sample_rate, 1 AS channels,
             CAST(k AS INTEGER) AS n_frames,
             CAST(k * spf AS BIGINT) AS n_samples,
             CAST(k * spf * 1000 // sr AS BIGINT) AS duration_ms,
             CAST(list_sum(kbps) AS BIGINT) AS sum_kbps,
             CAST(list_sum(pads) AS INTEGER) AS n_padded,
             CAST(id3v2 AS BIGINT) AS id3v2_bytes,
             id3v1 = 128 AS has_id3v1,
             CAST(id3v2 + id3v1 + list_sum(list_transform(range(k), j ->
               CASE WHEN layer = 1
                    THEN (12000 * kbps[j + 1] // sr + pads[j + 1]) * 4
                    ELSE 144000 * kbps[j + 1] // sr + pads[j + 1] END))
               AS BIGINT) AS stream_bytes
      FROM f ORDER BY doc_id"""))

  /** IMA ADPCM ENCODER under the oracle gate — q216 pins the decoder on
    * given codes; q219 pins the QUANTIZER: per document, 17 closed-form
    * PCM samples run through the real encoder
    * ([[graft.operators.MediaCodecs.encodeWavAdpcm]]: threshold cascade
    * against the current step, sign bit, decoder-tracked predictor so
    * encode and decode states never drift) and back through the real
    * decoder. The oracle replays BOTH machines in one recursive CTE —
    * the b4/b2/b1 threshold cascade, the reconstruction magnitude, the
    * clamps, and the index walk, generated textually from the same public
    * tables — so a swapped threshold, a wrong residual update, or an
    * encode-side state drift lands in the exact integer comparison.
    */
  val q219AdpcmEncode: QueryDef = QueryDef(
    "q219_adpcm_encode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val samples = Array.tabulate(17)(j =>
          ((r.v * 53 + j * 409) % 16384 - 8192).toShort)
        val bytes = graft.operators.MediaCodecs
          .encodeWavAdpcm(16000, samples, blockAlign = 12)
        graft.operators.Multimodal.MediaRow(r.doc_id, bytes,
          graft.operators.Multimodal.MediaMeta("wav", bytes.length, 0L))
      }
      graft.operators.Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"),
          col("width").as("n_samples"), col("channels"),
          element_at(col("features"), 1).cast("long").as("sample_rate"),
          element_at(col("features"), 2).cast("long").as("first_sample"),
          element_at(col("features"), 3).cast("long").as("sum_samples"),
          element_at(col("features"), 4).cast("long").as("wsum_samples"))
        .orderBy("doc_id")
    },
    Some {
      // Textual macros over the public tables: the encode threshold
      // cascade (b4/b2/b1 against step, step//2, step//4 of the CURRENT
      // step) and the shared reconstruction update, expanded inline in
      // the recursive step (SQL has no local bindings; rows are few).
      val step = s"$AdpcmStepsSql[idx + 1]"
      val sj = "((v * 53 + (j + 1) * 409) % 16384 - 8192)" // sample being encoded
      val d0 = s"abs($sj - pred)"
      val b4 = s"(CASE WHEN $d0 >= $step THEN 1 ELSE 0 END)"
      val r1 = s"($d0 - $b4 * $step)"
      val b2 = s"(CASE WHEN $r1 >= $step // 2 THEN 1 ELSE 0 END)"
      val r2 = s"($r1 - $b2 * ($step // 2))"
      val b1 = s"(CASE WHEN $r2 >= $step // 4 THEN 1 ELSE 0 END)"
      val mag = s"($step // 8 + $b1 * ($step // 4) + $b2 * ($step // 2) + $b4 * $step)"
      val sgn = s"(CASE WHEN $sj < pred THEN -1 ELSE 1 END)"
      s"""
      WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
        FROM documents),
      walk AS (
        SELECT doc_id, v, 0 AS j,
               CAST((v * 53) % 16384 - 8192 AS INTEGER) AS pred,
               0 AS idx
        FROM d
        UNION ALL
        SELECT doc_id, v, j + 1,
               CAST(least(32767, greatest(-32768, pred + $sgn * $mag)) AS INTEGER),
               CAST(least(88, greatest(0,
                 idx + [-1, -1, -1, -1, 2, 4, 6, 8][$b4 * 4 + $b2 * 2 + $b1 + 1]))
                 AS INTEGER)
        FROM walk WHERE j < 16)
      SELECT doc_id,
             17 AS n_samples, 1 AS channels,
             CAST(16000 AS BIGINT) AS sample_rate,
             CAST(min(CASE WHEN j = 0 THEN pred END) AS BIGINT) AS first_sample,
             CAST(sum(pred) AS BIGINT) AS sum_samples,
             CAST(sum((j + 1) * pred) AS BIGINT) AS wsum_samples
      FROM walk GROUP BY doc_id ORDER BY doc_id"""
    })

  /** G.711 COMPRESSION under the oracle gate — q207 pins the expansion on
    * given companded bytes; q220 pins the ENCODER direction: full-range
    * linear samples minted closed-form run through
    * [[graft.operators.MediaCodecs.mulawCompress]]/`alawCompress` (the
    * nearest-level inverse of the pinned expansions — ties to the lowest
    * code), then through the REAL container path (G.711 WAV encode → RIFF
    * walk → expansion) back to quantized linear. The oracle recomputes
    * compression from first principles — for each sample, the argmin over
    * all 256 codes of |expand(code) − x| with the same lowest-code tie
    * rule (list_position of the list min) — plus the reconstruction and
    * the max quantization error, all exact integers.
    */
  val q220G711Compand: QueryDef = QueryDef(
    "q220_g711_compand",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val out = src.map { r =>
        val aLaw = r.n % 2 == 0
        val ns = 14 + r.n % 7
        val xs = Array.tabulate(ns)(i => (r.v * 331 + i * 4391) % 65536 - 32768)
        val codes = xs.map(x =>
          if (aLaw) graft.operators.MediaCodecs.alawCompress(x)
          else graft.operators.MediaCodecs.mulawCompress(x))
        val wav = graft.operators.MediaCodecs
          .encodeWavG711(8000, codes.map(_.toByte), aLaw)
        val recon = graft.operators.MediaCodecs.decodeWavPcm16(wav)
          .getOrElse(sys.error(s"companded WAV failed to decode: doc ${r.doc_id}"))
          .samples
        var sc = 0L; var wc = 0L; var sr = 0L; var wr = 0L; var me = 0L
        var i = 0
        while (i < ns) {
          sc += codes(i); wc += (i + 1).toLong * codes(i)
          sr += recon(i); wr += (i + 1).toLong * recon(i)
          me = math.max(me, math.abs(recon(i).toLong - xs(i)))
          i += 1
        }
        (r.doc_id, ns, aLaw, sc, wc, sr, wr, me)
      }
      out.toDF("doc_id", "n_samples", "a_law", "sum_code", "wsum_code",
          "sum_recon", "wsum_recon", "max_abs_err")
        .orderBy("doc_id")
    },
    Some {
      // Expansion macros over a code expression, identical to the
      // q207-gated formulas (wire complement / XOR 0x55 on the argument).
      def mu(b: String) =
        s"""((CASE WHEN ((255 - ($b)) & 128) != 0 THEN -1 ELSE 1 END) *
           |  ((((255 - ($b)) & 15) * 8 + 132) *
           |   (1 << (((255 - ($b)) & 112) // 16)) - 132))""".stripMargin
      def al(b: String) =
        s"""((CASE WHEN (xor(($b), 85) & 128) != 0 THEN 1 ELSE -1 END) *
           |  (CASE WHEN (xor(($b), 85) & 112) // 16 = 0
           |          THEN (xor(($b), 85) & 15) * 16 + 8
           |        WHEN (xor(($b), 85) & 112) // 16 = 1
           |          THEN (xor(($b), 85) & 15) * 16 + 264
           |        ELSE ((xor(($b), 85) & 15) * 16 + 264) *
           |             (1 << ((xor(($b), 85) & 112) // 16 - 1)) END))""".stripMargin
      def argmin(exp: String => String) =
        s"""(list_position(
           |   list_transform(range(256), b -> abs(${exp("b")} - x)),
           |   list_min(
           |     list_transform(range(256), b -> abs(${exp("b")} - x)))) - 1)"""
          .stripMargin
      s"""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v, 14 + n % 7 AS ns, n % 2 = 0 AS alaw FROM d),
      sm AS (SELECT doc_id, v, ns, alaw, unnest(range(ns)) AS i FROM g),
      xx AS (SELECT doc_id, ns, alaw, i,
                    (v * 331 + i * 4391) % 65536 - 32768 AS x
             FROM sm),
      cc AS (SELECT doc_id, ns, alaw, i, x,
                    CASE WHEN alaw THEN ${argmin(al)}
                         ELSE ${argmin(mu)} END AS code
             FROM xx),
      rr AS (SELECT doc_id, ns, alaw, i, x, code,
                    CASE WHEN alaw THEN ${al("code")}
                         ELSE ${mu("code")} END AS recon
             FROM cc)
      SELECT doc_id,
             CAST(ns AS INTEGER) AS n_samples,
             alaw AS a_law,
             CAST(sum(code) AS BIGINT) AS sum_code,
             CAST(sum((i + 1) * code) AS BIGINT) AS wsum_code,
             CAST(sum(recon) AS BIGINT) AS sum_recon,
             CAST(sum((i + 1) * recon) AS BIGINT) AS wsum_recon,
             CAST(max(abs(recon - x)) AS BIGINT) AS max_abs_err
      FROM rr GROUP BY doc_id, ns, alaw ORDER BY doc_id"""
    })

  /** XING/INFO VBR TAG probe — the metadata block real MP3 encoders write
    * into the first Layer III frame (after the side info) so players can
    * length-report and seek without walking every frame: per document, a
    * VBR Layer III stream whose first frame carries a tag with a
    * doc-varying field set (frame total, byte total, TOC, quality — each
    * optionally present), parsed by [[graft.operators.MpegFrames.probe]]
    * and CROSS-CHECKED against the probe's own frame walk
    * (`frames_match` / `bytes_match`: tag truth vs walked truth). The
    * oracle recomputes the stream geometry closed-form, so a misplaced
    * side-info offset, a flag misread, or a skipped TOC shifts a field
    * and lands in the hash.
    */
  val q221XingProbe: QueryDef = QueryDef(
    "q221_xing_vbr_probe",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        val M = graft.operators.MpegFrames
        val srIdx = r.n % 3
        val sr = Seq(44100, 48000, 32000)(srIdx)
        val k = 2 + r.n % 4
        val frames = (0 until k).map(j =>
          (if (j == 0) 10 + r.v % 5 else 1 + (r.v + j) % 14,
            (r.n + j) % 2 == 0))
        val total = frames.map { case (bi, pad) =>
          M.frameBytes(3, M.bitrateKbps(3, bi), sr, pad)
        }.sum
        val tag = M.XingTag(
          vbr = r.n % 2 == 0,
          frames = if (r.v % 2 == 0) Some(k.toLong) else None,
          bytes = if (r.v % 3 == 0) Some(total.toLong) else None,
          toc = r.n % 3 == 0,
          quality = if (r.n % 4 == 0) Some((r.v % 101).toLong) else None)
        val bytes = M.synthStream(3, srIdx, frames,
          (fi, j) => (fi * 11 + j * 17) % 251, xing = Some(tag))
        val info = M.probe(bytes)
          .getOrElse(sys.error(s"synthesized stream failed to probe: doc ${r.doc_id}"))
        val x = info.xing
          .getOrElse(sys.error(s"Xing tag not parsed: doc ${r.doc_id}"))
        (r.doc_id, x.vbr, x.frames,
          x.frames.map(_ == info.nFrames.toLong),
          x.bytes, x.bytes.map(_ == bytes.length.toLong),
          x.toc, x.quality)
      }
      probed.toDF("doc_id", "is_vbr", "xing_frames", "frames_match",
          "xing_bytes", "bytes_match", "has_toc", "quality")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   [44100, 48000, 32000][n % 3 + 1] AS sr,
                   2 + n % 4 AS k
            FROM d),
      f AS (SELECT doc_id, n, v, k,
                   CAST(list_sum(list_transform(range(k), j ->
                     144000 * ([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
                       [CASE WHEN j = 0 THEN 10 + v % 5
                             ELSE (v + j) % 14 + 1 END])
                     // sr + CASE WHEN (n + j) % 2 = 0 THEN 1 ELSE 0 END))
                     AS BIGINT) AS total
            FROM g)
      SELECT doc_id,
             n % 2 = 0 AS is_vbr,
             CASE WHEN v % 2 = 0 THEN CAST(k AS BIGINT) END AS xing_frames,
             CASE WHEN v % 2 = 0 THEN TRUE END AS frames_match,
             CASE WHEN v % 3 = 0 THEN total END AS xing_bytes,
             CASE WHEN v % 3 = 0 THEN TRUE END AS bytes_match,
             n % 3 = 0 AS has_toc,
             CASE WHEN n % 4 = 0 THEN CAST(v % 101 AS BIGINT) END AS quality
      FROM f ORDER BY doc_id"""))

  /** MULTI-BLOCK ADPCM with the `fact` chunk under the oracle gate —
    * q219 pins the quantizer on one exactly-full block; q222 pins the
    * BLOCK MACHINERY: a doc-varying sample count spanning two blocks, so
    * the stream exercises the verbatim block-2 header (predictor reset to
    * the exact sample), the step-index CARRY across the block boundary,
    * the final block's zero-code padding, and the fact chunk's truncation
    * back to the true count. The oracle's recursive CTE replays the
    * encoder with the block rule inline — at each 17-sample boundary the
    * predictor snaps to the sample and the index carries — and the row
    * count per doc IS the fact assertion (a decoder ignoring fact would
    * emit padded rows and break n_samples and both sums).
    */
  val q222AdpcmBlocks: QueryDef = QueryDef(
    "q222_adpcm_blocks",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val ns = 20 + r.n % 9 // 20..28: always 2 blocks of 17, second partial
        val samples = Array.tabulate(ns)(j =>
          ((r.v * 61 + j * 557) % 16384 - 8192).toShort)
        val bytes = graft.operators.MediaCodecs
          .encodeWavAdpcm(8000, samples, blockAlign = 12)
        graft.operators.Multimodal.MediaRow(r.doc_id, bytes,
          graft.operators.Multimodal.MediaMeta("wav", bytes.length, 0L))
      }
      graft.operators.Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"),
          col("width").as("n_samples"), col("channels"),
          element_at(col("features"), 1).cast("long").as("sample_rate"),
          element_at(col("features"), 2).cast("long").as("first_sample"),
          element_at(col("features"), 3).cast("long").as("sum_samples"),
          element_at(col("features"), 4).cast("long").as("wsum_samples"))
        .orderBy("doc_id")
    },
    Some {
      val step = s"$AdpcmStepsSql[idx + 1]"
      val sj = "((v * 61 + (j + 1) * 557) % 16384 - 8192)"
      val d0 = s"abs($sj - pred)"
      val b4 = s"(CASE WHEN $d0 >= $step THEN 1 ELSE 0 END)"
      val r1 = s"($d0 - $b4 * $step)"
      val b2 = s"(CASE WHEN $r1 >= $step // 2 THEN 1 ELSE 0 END)"
      val r2 = s"($r1 - $b2 * ($step // 2))"
      val b1 = s"(CASE WHEN $r2 >= $step // 4 THEN 1 ELSE 0 END)"
      val mag = s"($step // 8 + $b1 * ($step // 4) + $b2 * ($step // 2) + $b4 * $step)"
      val sgn = s"(CASE WHEN $sj < pred THEN -1 ELSE 1 END)"
      s"""
      WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n,
               CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
        FROM documents),
      g AS (SELECT doc_id, v, 20 + n % 9 AS ns FROM d),
      walk AS (
        SELECT doc_id, v, ns, 0 AS j,
               CAST((v * 61) % 16384 - 8192 AS INTEGER) AS pred,
               0 AS idx
        FROM g
        UNION ALL
        SELECT doc_id, v, ns, j + 1,
               CASE WHEN (j + 1) % 17 = 0
                    THEN CAST($sj AS INTEGER) -- block header: verbatim sample
                    ELSE CAST(least(32767, greatest(-32768,
                           pred + $sgn * $mag)) AS INTEGER) END,
               CASE WHEN (j + 1) % 17 = 0
                    THEN idx -- index CARRIES across the block boundary
                    ELSE CAST(least(88, greatest(0,
                           idx + [-1, -1, -1, -1, 2, 4, 6, 8]
                             [$b4 * 4 + $b2 * 2 + $b1 + 1])) AS INTEGER) END
        FROM walk WHERE j < ns - 1)
      SELECT doc_id,
             CAST(ns AS INTEGER) AS n_samples, 1 AS channels,
             CAST(8000 AS BIGINT) AS sample_rate,
             CAST(min(CASE WHEN j = 0 THEN pred END) AS BIGINT) AS first_sample,
             CAST(sum(pred) AS BIGINT) AS sum_samples,
             CAST(sum((j + 1) * pred) AS BIGINT) AS wsum_samples
      FROM walk GROUP BY doc_id, ns ORDER BY doc_id"""
    })

  /** PARQUET + ZSTD text container round-trip — SCALE.md's recommended
    * shape for compressed text at 100 TB (row groups split regardless of
    * compression: neither gzip's single-split trap nor bzip2's block
    * alignment applies): the documents table dumps through
    * [[graft.sources.CompressedIngest.documentsParquet]] (memoized, same
    * harness as q203/q206) and exact dedup runs on what came back, pinned
    * by q24's oracle over the ORIGINAL parquet. `StorageLayoutSpec`
    * separately asserts from the parquet FOOTER that every column chunk
    * really carries the ZSTD codec — the claim is observed, not assumed.
    */
  val q223ZstdParquet: QueryDef = QueryDef(
    "q223_zstd_parquet_ingest",
    (s, dir) => {
      val back = graft.sources.CompressedIngest.documentsParquet(s, dir, "zstd")
      graft.operators.Dedup.exactDedup(back).orderBy("keep_doc_id")
    },
    Some("""
      SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_doc_id"""))

  /** ORC + ZSTD round-trip — the OTHER columnar container Spark ships
    * natively, under the same gate as q223's parquet form: documents dump
    * through [[graft.sources.CompressedIngest.documentsOrc]] (memoized),
    * exact dedup on the read-back, q24's oracle over the ORIGINAL
    * parquet. `StorageLayoutSpec` asserts the ZSTD compression kind from
    * the ORC file's own footer (orc-core reader) — observed, not assumed.
    */
  val q225OrcIngest: QueryDef = QueryDef(
    "q225_orc_zstd_ingest",
    (s, dir) => {
      val back = graft.sources.CompressedIngest.documentsOrc(s, dir, "zstd")
      graft.operators.Dedup.exactDedup(back).orderBy("keep_doc_id")
    },
    Some("""
      SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_doc_id"""))

  /** LUHN-VALIDATED PAYMENT-CARD PII — the curation scrub the email/phone
    * pass (q55 family) cannot do with a regex alone: 16-digit candidates
    * are cheap to find, but only the Luhn checksum separates real card
    * numbers from arbitrary digit runs, and a pipeline that redacts every
    * 16-digit run destroys order ids and ISBNs. Per document, two minted
    * candidates ride the text — one Luhn-VALID (check digit computed),
    * one guaranteed invalid (check digit +1 mod 10) —
    * [[graft.operators.TextAnalysis.luhnScrub]] extracts candidates,
    * validates each with the doubling fold, counts both classes, and
    * redacts ONLY the valid ones. The oracle recomputes the Luhn fold in
    * SQL over the same minted digits and predicts the redacted text's
    * md5 — a wrong doubling parity, a reversed fold, or an over-eager
    * redaction all land in the hash.
    */
  val q224LuhnPii: QueryDef = QueryDef(
    "q224_luhn_pii",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      // 15 deterministic digits from v + the position, then the Luhn
      // check digit (valid) or check+1 mod 10 (invalid)
      val digits15 = (0 until 15).map(i => pmod(col("v") * (i + 3) + i * 7, lit(10)))
      // Luhn sum over the 15 payload digits as positions 2..16 from the
      // RIGHT (the check digit is position 1): digit index i (0-based
      // from the left of the 15) sits at right-position 16 - i, doubled
      // when that position is even -> i even
      val luhnSum = digits15.zipWithIndex.map { case (dcol, i) =>
        if (i % 2 == 0) {
          val d2 = dcol * 2
          when(d2 > 9, d2 - 9).otherwise(d2)
        } else dcol
      }.reduce(_ + _)
      val check = pmod(lit(10) - pmod(luhnSum, lit(10)), lit(10))
      val validCard = concat((digits15 :+ check).map(_.cast("string")): _*)
      val invalidCard = concat(
        (digits15 :+ pmod(check + 1, lit(10))).map(_.cast("string")): _*)
      // digit-free carrier (every corpus digit -> 'x'), so the ONLY
      // 16-digit candidates are the two minted ones — data-independent
      val salted = concat(regexp_replace(col("text"), "[0-9]", "x"),
        lit(" card "), validCard, lit(" ref "), invalidCard)
      graft.operators.TextAnalysis.luhnScrub(
          d.select(col("doc_id"), salted.as("text")), "text")
        .select(col("doc_id"),
          col("n_card_candidates"), col("n_luhn_valid"),
          length(col("scrubbed")).cast("long").as("scrubbed_len"),
          md5(col("scrubbed").cast("binary")).as("scrubbed_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, text,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, text, v,
                   list_transform(range(15), i -> (v * (i + 3) + i * 7) % 10) AS ds
            FROM d),
      c AS (SELECT doc_id, text,
                   list_aggregate(list_transform(ds, x -> CAST(x AS VARCHAR)),
                                  'string_agg', '') AS body,
                   (10 - list_sum(list_transform(range(15), i ->
                      CASE WHEN i % 2 = 0
                           THEN CASE WHEN ds[i + 1] * 2 > 9 THEN ds[i + 1] * 2 - 9
                                     ELSE ds[i + 1] * 2 END
                           ELSE ds[i + 1] END)) % 10) % 10 AS chk
            FROM g)
      SELECT doc_id,
             CAST(2 AS BIGINT) AS n_card_candidates,
             CAST(1 AS BIGINT) AS n_luhn_valid,
             CAST(len(text) + 33 AS BIGINT) AS scrubbed_len,
             md5(regexp_replace(text, '[0-9]', 'x', 'g') ||
                 ' card <CARD> ref ' || body ||
                 CAST((chk + 1) % 10 AS VARCHAR)) AS scrubbed_md5
      FROM c ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q216AdpcmDecode, q217CleanCorpus, q218MpegFrameWalk, q219AdpcmEncode,
      q220G711Compand, q221XingProbe, q222AdpcmBlocks, q223ZstdParquet,
      q224LuhnPii, q225OrcIngest)
}
