package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{JpegCodec, MediaCodecs, Multimodal}

/** Round-8 surface, first tranche: the palette-PNG decode path (color type
  * 3 — icons/plots/screenshots, the wild's most common indexed format) made
  * REAL, following the q200 protocol.
  */
object Round8Queries {

  /** Palette-PNG roundtrip: per document, encode a (5..16)×(4..8) color-
    * type-3 PNG with a (2 + v%7)-entry palette — entry j = (v + j,
    * 255 − v − j, (2v + j) mod 251), pixel (x, y) indexing entry
    * (x + y) mod P, row filters cycling 0..4 — then REALLY decode it
    * ([[MediaCodecs.decodePng]]'s PLTE lookup path via
    * [[Multimodal.decodeFeatures]]) and emit the q148/q200 order-sensitive
    * pixel statistics. The oracle predicts every value from `documents`
    * alone (nested range/list_transform sums), so a palette read off by an
    * entry, an index byte unfiltered wrongly, or a dropped PLTE bounds
    * check all land in the hash comparison.
    */
  val q205PalettePng: QueryDef = QueryDef(
    "q205_palette_png",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val w = 5 + r.n % 12
        val h = 4 + (r.n / 9) % 5
        val p = 2 + r.v % 7
        val pal = Array.tabulate(p)(j =>
          (r.v + j, 255 - r.v - j, (2 * r.v + j) % 251))
        val bytes = MediaCodecs.encodePngPalette(w, h, pal,
          (x, y) => (x + y) % p, filterOf = _ % 5)
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("png", bytes.length, 0L))
      }
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("features"), 1).cast("long").as("top_r"),
          element_at(col("features"), 2).cast("long").as("top_g"),
          element_at(col("features"), 3).cast("long").as("top_b"),
          element_at(col("features"), 4).cast("long").as("wsum_r"),
          element_at(col("features"), 5).cast("long").as("wsum_g"),
          element_at(col("features"), 6).cast("long").as("wsum_b"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v,
                   5 + n % 12 AS w,
                   4 + (n // 9) % 5 AS h,
                   2 + v % 7 AS p
            FROM d)
      SELECT doc_id, w AS width, h AS height, 3 AS channels,
             CAST(v AS BIGINT)             AS top_r,
             CAST(255 - v AS BIGINT)       AS top_g,
             CAST((2 * v) % 251 AS BIGINT) AS top_b,
             CAST(list_sum(list_transform(range(h), y -> (y + 1) *
               list_sum(list_transform(range(w), x -> v + (x + y) % p))))
               AS BIGINT) AS wsum_r,
             CAST(list_sum(list_transform(range(h), y -> (y + 1) *
               list_sum(list_transform(range(w), x -> 255 - v - (x + y) % p))))
               AS BIGINT) AS wsum_g,
             CAST(list_sum(list_transform(range(h), y -> (y + 1) *
               list_sum(list_transform(range(w), x -> (2 * v + (x + y) % p) % 251))))
               AS BIGINT) AS wsum_b
      FROM g ORDER BY doc_id"""))

  /** Baseline-JPEG roundtrip — the first LOSSY format on the real decode
    * path: per document, encode a 16/32-square-multiple 4:4:4 or 4:2:0
    * (alternating by doc) baseline JFIF whose luma block row `by` is the
    * flat value v + by with Cb = Cr = 128, every fifth doc carrying
    * restart markers, then REALLY decode it ([[JpegCodec.decodeJpeg]]:
    * marker walk → Huffman entropy decode → dequant → IDCT → chroma
    * upsample → YCbCr, via [[Multimodal.decodeFeatures]]'s sniff chain)
    * and emit the q148/q200 pixel statistics. Flat blocks make the lossy
    * codec exact ([[JpegCodec.FlatQuant]]: every AC is zero, the IDCT of a
    * pure-DC block is closed-form), so the DuckDB oracle predicts every
    * value from `documents` alone — a wrong Huffman code, a broken zigzag,
    * an off-by-one DC prediction, or a chroma swizzle all land in the hash
    * comparison.
    */
  val q204JpegDecode: QueryDef = QueryDef(
    "q204_jpeg_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val w = 16 * (1 + r.n % 2)
        val h = 16 * (1 + (r.n / 7) % 2)
        val bytes = JpegCodec.encodeJpegFlat(w, h,
          subsample420 = r.n % 3 == 0,
          (_, by) => r.v + by,
          restartInterval = if (r.n % 5 == 0) 2 else 0)
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("jpeg", bytes.length, 0L))
      }
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("features"), 1).cast("long").as("top_r"),
          element_at(col("features"), 2).cast("long").as("top_g"),
          element_at(col("features"), 3).cast("long").as("top_b"),
          element_at(col("features"), 4).cast("long").as("wsum_r"),
          element_at(col("features"), 5).cast("long").as("wsum_g"),
          element_at(col("features"), 6).cast("long").as("wsum_b"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v,
                   16 * (1 + n % 2) AS w,
                   16 * (1 + (n // 7) % 2) AS h
            FROM d)
      SELECT doc_id, w AS width, h AS height, 3 AS channels,
             CAST(v AS BIGINT) AS top_r,
             CAST(v AS BIGINT) AS top_g,
             CAST(v AS BIGINT) AS top_b,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y // 8)))
               AS BIGINT) AS wsum_r,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y // 8)))
               AS BIGINT) AS wsum_g,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y // 8)))
               AS BIGINT) AS wsum_b
      FROM g ORDER BY doc_id"""))

  /** SPLITTABLE compressed-text ingest — q203's gzip sibling with the
    * 100 TB-correct codec: the documents table round-trips through
    * bzip2-compressed JSON-lines (Hadoop resolves the codec off the `.bz2`
    * suffix), then exact dedup runs on what came back, pinned by q24's
    * oracle over the ORIGINAL parquet. Unlike gzip, bzip2's 100 KB block
    * structure lets ONE big shard read as many input splits —
    * StorageLayoutSpec observes >1 nonempty split on a single file — so
    * writer shard sizing stops being the read-side parallelism knob
    * (SCALE.md §gzip).
    */
  val q206Bzip2Ingest: QueryDef = QueryDef(
    "q206_bzip2_ingest",
    (s, dir) => {
      // memoized dump (graft.sources.CompressedIngest): repeats measure
      // the splittable-bzip2 READ path, not a rewrite of identical bytes
      val back = graft.sources.CompressedIngest.documentsRoundTrip(s, dir, "bzip2")
      graft.operators.Dedup.exactDedup(back).orderBy("keep_doc_id")
    },
    Some("""
      SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_doc_id"""))

  /** G.711 µ-law / A-law telephony audio decode — WAV format codes 7/6,
    * the companded 8-bit formats real speech lakes carry: per document,
    * encode a mono G.711 WAV (alternating law by doc) whose companded
    * bytes sweep the full 0..255 range (every segment of both laws
    * participates), then REALLY decode it
    * ([[MediaCodecs.decodeWavPcm16]]'s expansion path) and emit the q149
    * sample statistics. The oracle RECOMPUTES the public CCITT expansion
    * in SQL (bias/segment/mantissa arithmetic over the byte sequence), so
    * a wrong bias, an off-by-one segment shift, or a sign-bit slip all
    * hash-mismatch. Sample counts stay ≤ 30 so every feature magnitude is
    * under 2^24 and exact in the float features array.
    */
  val q207G711Decode: QueryDef = QueryDef(
    "q207_g711_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val ns = 16 + r.n % 15
        val data = Array.tabulate(ns)(i => ((r.v * 7 + i * 13) % 256).toByte)
        val bytes = MediaCodecs.encodeWavG711(8000, data, aLaw = r.n % 2 == 0)
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("wav", bytes.length, 0L))
      }
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"),
          col("width").as("n_samples"), col("channels"),
          element_at(col("features"), 1).cast("long").as("sample_rate"),
          element_at(col("features"), 2).cast("long").as("first_sample"),
          element_at(col("features"), 3).cast("long").as("sum_samples"),
          element_at(col("features"), 4).cast("long").as("wsum_samples"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v, 16 + n % 15 AS ns, n % 2 = 0 AS alaw FROM d),
      e AS (SELECT doc_id, ns,
              CASE WHEN alaw THEN
                list_transform(
                  list_transform(range(ns), i -> xor((v * 7 + i * 13) % 256, 85)),
                  a -> (CASE WHEN (a & 128) != 0 THEN 1 ELSE -1 END) *
                       (CASE WHEN (a & 112) // 16 = 0 THEN (a & 15) * 16 + 8
                             WHEN (a & 112) // 16 = 1 THEN (a & 15) * 16 + 264
                             ELSE ((a & 15) * 16 + 264) * (1 << ((a & 112) // 16 - 1))
                        END))
              ELSE
                list_transform(
                  list_transform(range(ns), i -> 255 - (v * 7 + i * 13) % 256),
                  u -> (CASE WHEN (u & 128) != 0 THEN -1 ELSE 1 END) *
                       (((u & 15) * 8 + 132) * (1 << ((u & 112) // 16)) - 132))
              END AS s
            FROM g)
      SELECT doc_id, ns AS n_samples, 1 AS channels,
             CAST(8000 AS BIGINT) AS sample_rate,
             CAST(s[1] AS BIGINT) AS first_sample,
             CAST(list_sum(s) AS BIGINT) AS sum_samples,
             CAST(list_sum(list_transform(range(ns), i -> (i + 1) * s[i + 1]))
               AS BIGINT) AS wsum_samples
      FROM e ORDER BY doc_id"""))

  private def h32at(x: String, pos: Int): String =
    s"(('0x' || substr(md5($x), $pos, 8))::BIGINT)"

  /** The STREAMING count-min state path under the ORACLE gate:
    * [[graft.streaming.EventsStreaming.streamingCountMin]] — the exact
    * mapGroupsWithState function the continuous query runs — executed over
    * the batch `events` frame (batch mode folds each key's rows through
    * the same state update once), its 4×512 counter state exploded to
    * nonzero (row, bucket, c) cells and hash-compared against the q129
    * count-min derivation recomputed by DuckDB over `concat('u', user_id)`.
    * StreamingSpec separately proves the micro-batched run reaches this
    * same state at every prefix; this query pins WHAT that state is.
    */
  val q208StreamingCmState: QueryDef = QueryDef(
    "q208_streaming_cm_state",
    (s, dir) => {
      graft.streaming.EventsStreaming
        .streamingCountMin(Tables.load(s, dir, "events"))
        .select(col("row"),
          posexplode(col("counters")).as(Seq("bucket", "c")))
        .filter(col("c") > 0)
        .orderBy("row", "bucket")
    },
    Some(s"""
      WITH k AS (SELECT 'u' || CAST(user_id AS VARCHAR) AS k FROM events),
      cells AS (
        SELECT unnest([0, 1, 2, 3]) AS row,
               unnest([${h32at("k", 1)} % 512, ${h32at("k", 9)} % 512,
                       ${h32at("k", 17)} % 512, ${h32at("k", 25)} % 512])
                 AS bucket
        FROM k)
      SELECT CAST(row AS INTEGER) AS row, CAST(bucket AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM cells GROUP BY row, bucket ORDER BY row, bucket"""))

  /** The STREAMING HyperLogLog state path under the ORACLE gate:
    * [[graft.streaming.EventsStreaming.hllRegisterState]] — the same
    * register-max state update `hllDistinctUsers` folds per micro-batch —
    * over the batch `events` frame, nonzero registers exploded to
    * (event_type, idx, rho) and checked against DuckDB recomputing the
    * q132 register derivation (md5-derived 32-bit hash, low 8 bits index,
    * MSB-position rank of the remaining 24). Registers are integers, so
    * the state compares exactly across engines where the estimate's
    * log-based correction could not.
    */
  val q209StreamingHllState: QueryDef = QueryDef(
    "q209_streaming_hll_state",
    (s, dir) => {
      graft.streaming.EventsStreaming
        .hllRegisterState(Tables.load(s, dir, "events"))
        .select(col("event_type"),
          posexplode(col("regs")).as(Seq("idx", "rho")))
        .filter(col("rho") > 0)
        .orderBy("event_type", "idx")
    },
    Some(s"""
      WITH h AS (SELECT event_type,
                        ${h32at("('u' || CAST(user_id AS VARCHAR))", 1)} AS hv
                 FROM events)
      SELECT event_type, CAST(hv % 256 AS INTEGER) AS idx,
             CAST(max(CASE WHEN hv // 256 = 0 THEN 25
                           ELSE 25 - length(bin(hv // 256)) END) AS INTEGER) AS rho
      FROM h GROUP BY event_type, idx ORDER BY event_type, idx"""))

  /** 16-BIT PNG roundtrip (photography/scientific depth): per document,
    * encode a depth-16 RGB PNG whose row y carries HIGH bytes (v+y,
    * v+2y+1, v+3y+2) over NONZERO low bytes derived from n — decode
    * scales by the high byte, so a big-endian/little-endian slip or a
    * one-byte-per-sample stride bug shifts every decoded value and lands
    * in the hash. Same decoded image as q200, so q200's oracle pins it;
    * filters cycle 0..4 over the doubled-stride rows.
    */
  val q210Png16Decode: QueryDef = QueryDef(
    "q210_png16_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val w = 5 + r.n % 12
        val h = 4 + (r.n / 9) % 5
        val lo = 1 + r.n % 255 // nonzero low byte: endianness slips visible
        val bytes = MediaCodecs.encodePng16(w, h,
          (_, y) => (((r.v + y) << 8) | lo,
            ((r.v + 2 * y + 1) << 8) | lo,
            ((r.v + 3 * y + 2) << 8) | lo),
          filterOf = _ % 5)
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("png", bytes.length, 0L))
      }
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("features"), 1).cast("long").as("top_r"),
          element_at(col("features"), 2).cast("long").as("top_g"),
          element_at(col("features"), 3).cast("long").as("top_b"),
          element_at(col("features"), 4).cast("long").as("wsum_r"),
          element_at(col("features"), 5).cast("long").as("wsum_g"),
          element_at(col("features"), 6).cast("long").as("wsum_b"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v,
                   5 + n % 12 AS w,
                   4 + (n // 9) % 5 AS h
            FROM d)
      SELECT doc_id, w AS width, h AS height, 3 AS channels,
             CAST(v AS BIGINT)     AS top_r,
             CAST(v + 1 AS BIGINT) AS top_g,
             CAST(v + 2 AS BIGINT) AS top_b,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y)))
               AS BIGINT) AS wsum_r,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + 2 * y + 1)))
               AS BIGINT) AS wsum_g,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + 3 * y + 2)))
               AS BIGINT) AS wsum_b
      FROM g ORDER BY doc_id"""))

  /** ADAM7-INTERLACED PNG roundtrip: per document, encode the interlaced
    * layout (seven independently-filtered passes) with a pattern varying
    * in BOTH axes — (v + y + x mod 3, 255 − v − (x + 2y) mod 5,
    * (2v + x + y) mod 251) — so a pass scattered to the wrong offset or
    * step lands in the order-sensitive sums. The oracle computes the
    * logical image directly (it never sees the pass structure): correct
    * deinterlacing is exactly what makes the two match.
    */
  val q211Adam7Decode: QueryDef = QueryDef(
    "q211_adam7_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val w = 5 + r.n % 12
        val h = 4 + (r.n / 9) % 5
        val bytes = MediaCodecs.encodePngAdam7(w, h,
          (x, y) => (r.v + y + x % 3,
            255 - r.v - (x + 2 * y) % 5,
            (2 * r.v + x + y) % 251),
          filterOf = _ % 5)
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("png", bytes.length, 0L))
      }
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("features"), 1).cast("long").as("top_r"),
          element_at(col("features"), 2).cast("long").as("top_g"),
          element_at(col("features"), 3).cast("long").as("top_b"),
          element_at(col("features"), 4).cast("long").as("wsum_r"),
          element_at(col("features"), 5).cast("long").as("wsum_g"),
          element_at(col("features"), 6).cast("long").as("wsum_b"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v,
                   5 + n % 12 AS w,
                   4 + (n // 9) % 5 AS h
            FROM d)
      SELECT doc_id, w AS width, h AS height, 3 AS channels,
             CAST(v AS BIGINT)               AS top_r,
             CAST(255 - v AS BIGINT)         AS top_g,
             CAST((2 * v) % 251 AS BIGINT)   AS top_b,
             CAST(list_sum(list_transform(range(h), y -> (y + 1) *
               list_sum(list_transform(range(w), x -> v + y + x % 3))))
               AS BIGINT) AS wsum_r,
             CAST(list_sum(list_transform(range(h), y -> (y + 1) *
               list_sum(list_transform(range(w), x -> 255 - v - (x + 2 * y) % 5))))
               AS BIGINT) AS wsum_g,
             CAST(list_sum(list_transform(range(h), y -> (y + 1) *
               list_sum(list_transform(range(w), x -> (2 * v + x + y) % 251))))
               AS BIGINT) AS wsum_b
      FROM g ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(
    q204JpegDecode, q205PalettePng, q206Bzip2Ingest, q207G711Decode,
    q208StreamingCmState, q209StreamingHllState, q210Png16Decode,
    q211Adam7Decode)
}
