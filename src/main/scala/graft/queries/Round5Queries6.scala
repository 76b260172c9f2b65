package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{MediaCodecs, Multimodal}

/** Round-5 surface, sixth tranche: REAL media decode roundtrips — the
  * multimodal column path with an actual byte-level codec in it
  * ([[graft.operators.MediaCodecs]]) instead of the earlier stub.
  *
  * Shape of both queries: Spark synthesizes a REAL media file per document
  * (deterministic content seeded by the engine-portable md5 hash of the
  * text), then decodes it back with the independent parser and emits header
  * fields plus order-sensitive content statistics. The DuckDB oracle
  * predicts every output column from the documents table alone via the
  * same arithmetic — so any decoder defect (padding bytes read as pixels,
  * bottom-up rows left unflipped, RGB/BGR swizzle, chunk walk off by one)
  * lands in the hash comparison. The encode→decode pair never shares state
  * beyond the format spec: the encoder writes the spec'd layout, the
  * decoder re-derives everything from the bytes.
  */
object Round5Queries6 {

  /** Encoder source row — must not be `private`: Spark's generated
    * SafeProjection accesses the class from outside this object.
    */
  case class MediaSrc(doc_id: Long, n: Int, v: Int)

  /** BMP roundtrip: per document, encode a (8..16)×(4..8) 24-bit BMP whose
    * logical row y is the flat color (v+y, v+2y+1, v+3y+2) — v < 200 keeps
    * every channel below 256, so the oracle needs no modular wraparound —
    * then REALLY decode it ([[MediaCodecs.decodeBmp24]] via
    * [[Multimodal.decodeFeatures]]'s sniffing path) and emit:
    *
    *  - width/height/channels from the parsed BITMAPINFOHEADER;
    *  - file_bytes measured on the payload column (validates the header
    *    arithmetic 54 + stride·h with stride = ceil(3w/4)·4 — the row
    *    PADDING rule);
    *  - top_r/g/b = the decoded top-left pixel: wrong unless the decoder
    *    flips the format's BOTTOM-UP row storage and unswizzles BGR;
    *  - wsum_r/g/b = Σ_y (y+1)·Σ_x channel(x,y): row-order-sensitive, so
    *    any misalignment (padding consumed as pixels) shifts it.
    *
    * The width range straddles all four (3w mod 4) padding classes.
    */
  val q148BmpDecode: QueryDef = QueryDef(
    "q148_bmp_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[MediaSrc]
      val media = src.map { r =>
        val w = 8 + r.n % 9
        val h = 4 + (r.n / 9) % 5
        val bytes = MediaCodecs.encodeBmp24(w, h,
          (_, y) => (r.v + y, r.v + 2 * y + 1, r.v + 3 * y + 2))
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("bmp", bytes.length, 0L))
      }
      // n_bytes rides the decode pass (decodeFeaturesSized): one encode
      // per payload, no size-side join
      Multimodal.decodeFeaturesSized(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("n_bytes").as("file_bytes"),
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
                   8 + n % 9 AS w,
                   4 + (n // 9) % 5 AS h
            FROM d)
      SELECT doc_id, w AS width, h AS height, 3 AS channels,
             CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS file_bytes,
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

  /** WAV roundtrip: per document, encode 40..100 PCM16 mono samples
    * s_i = (v·31 + i·17) mod 4001 − 2000 at one of three sample rates, then
    * REALLY decode via the RIFF chunk walk ([[MediaCodecs.decodeWavPcm16]])
    * and emit header fields + content sums. first_sample catches an
    * off-by-one in the data-chunk offset; wsum (Σ (i+1)·s_i) is
    * order-sensitive so little-endian byte swaps or a skipped pad byte
    * shift it. All sums stay below 2^24, exact in the float features.
    */
  val q149WavDecode: QueryDef = QueryDef(
    "q149_wav_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[MediaSrc]
      val media = src.map { r =>
        val rate = 8000 + (r.n % 3) * 4000
        val ns = 40 + r.n % 61
        val samples = Array.tabulate(ns)(i =>
          ((r.v * 31 + i * 17) % 4001 - 2000).toShort)
        Multimodal.MediaRow(r.doc_id, MediaCodecs.encodeWavPcm16(rate, samples),
          Multimodal.MediaMeta("wav", MediaCodecs.wavFileSize(ns), 0L))
      }
      Multimodal.decodeFeaturesSized(media).toDF()
        .select(col("doc_id"),
          col("width").as("n_samples"), col("channels"),
          col("n_bytes").as("file_bytes"),
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
      g AS (SELECT doc_id, v,
                   8000 + (n % 3) * 4000 AS rate,
                   40 + n % 61 AS ns
            FROM d)
      SELECT doc_id, ns AS n_samples, 1 AS channels,
             CAST(44 + 2 * ns AS BIGINT) AS file_bytes,
             CAST(rate AS BIGINT) AS sample_rate,
             CAST((v * 31) % 4001 - 2000 AS BIGINT) AS first_sample,
             CAST(list_sum(list_transform(range(ns),
               i -> (v * 31 + i * 17) % 4001 - 2000)) AS BIGINT) AS sum_samples,
             CAST(list_sum(list_transform(range(ns),
               i -> (i + 1) * ((v * 31 + i * 17) % 4001 - 2000))) AS BIGINT)
               AS wsum_samples
      FROM g ORDER BY doc_id"""))

  /** REAL image FEATURE EXTRACTION — 2×2 quadrant pooling over actually
    * decoded pixels (the "thumbnail features" step of an image-curation
    * pipeline, on the real decode path rather than the stub): the BMP from
    * q148's encoder is parsed back ([[MediaCodecs.decodeBmp24]]) and the
    * red channel pools into top-left/top-right/bottom-left/bottom-right
    * sums (odd widths/heights split ceil/floor — the left/top halves take
    * the extra column/row), plus whole-image green/blue totals. Quadrant
    * sums are ROW-SENSITIVE: an unflipped bottom-up read swaps top and
    * bottom quadrants, and a wrong ceil/floor split shifts the left/right
    * ones — each lands in the hash compare against the oracle's
    * closed-form prediction. Per-payload pure function in a typed map —
    * embarrassingly parallel, no shuffle.
    */
  val q158BmpPool: QueryDef = QueryDef(
    "q158_bmp_pool",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[MediaSrc]
      src.map { r =>
        val w = 8 + r.n % 9
        val h = 4 + (r.n / 9) % 5
        val bytes = MediaCodecs.encodeBmp24(w, h,
          (_, y) => (r.v + y, r.v + 2 * y + 1, r.v + 3 * y + 2))
        val img = MediaCodecs.decodeBmp24(bytes).get
        val qw = (img.width + 1) / 2
        val qh = (img.height + 1) / 2
        var qtl = 0L; var qtr = 0L; var qbl = 0L; var qbr = 0L
        var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            val (pr, pg, pb) = img.pixels(y * img.width + x)
            if (y < qh) { if (x < qw) qtl += pr else qtr += pr }
            else { if (x < qw) qbl += pr else qbr += pr }
            sg += pg; sb += pb
            x += 1
          }
          y += 1
        }
        (r.doc_id, img.width, img.height, qtl, qtr, qbl, qbr, sg, sb)
      }.toDF("doc_id", "width", "height", "qtl_r", "qtr_r", "qbl_r", "qbr_r",
          "sum_g", "sum_b")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v,
                   8 + n % 9 AS w,
                   4 + (n // 9) % 5 AS h
            FROM d),
      q AS (SELECT doc_id, v, w, h,
                   (w + 1) // 2 AS qw, (h + 1) // 2 AS qh
            FROM g)
      SELECT doc_id, w AS width, h AS height,
             CAST(qw * list_sum(list_transform(range(qh), y -> v + y))
               AS BIGINT) AS qtl_r,
             CAST((w - qw) * list_sum(list_transform(range(qh), y -> v + y))
               AS BIGINT) AS qtr_r,
             CAST(qw * list_sum(list_transform(range(qh, h), y -> v + y))
               AS BIGINT) AS qbl_r,
             CAST((w - qw) * list_sum(list_transform(range(qh, h), y -> v + y))
               AS BIGINT) AS qbr_r,
             CAST(w * list_sum(list_transform(range(h), y -> v + 2 * y + 1))
               AS BIGINT) AS sum_g,
             CAST(w * list_sum(list_transform(range(h), y -> v + 3 * y + 2))
               AS BIGINT) AS sum_b
      FROM q ORDER BY doc_id"""))

  /** REAL audio FEATURE EXTRACTION over decoded PCM samples — the signal
    * statistics an audio-curation pipeline gates on (silence/clipping/
    * activity), computed from the actually parsed WAV (q149's encoder →
    * [[MediaCodecs.decodeWavPcm16]]): zero-crossing count (strict sign
    * changes — order-sensitive, so any sample-order defect in the chunk
    * walk shifts it), total energy Σs² (exact int64; max 100·2000² ≈
    * 4·10⁸), and peak amplitude. The oracle recomputes all three from the
    * generation formulas without ever seeing the bytes.
    */
  val q159WavFeatures: QueryDef = QueryDef(
    "q159_wav_features",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[MediaSrc]
      src.map { r =>
        val rate = 8000 + (r.n % 3) * 4000
        val ns = 40 + r.n % 61
        val samples = Array.tabulate(ns)(i =>
          ((r.v * 31 + i * 17) % 4001 - 2000).toShort)
        val a = MediaCodecs.decodeWavPcm16(
          MediaCodecs.encodeWavPcm16(rate, samples)).get
        var zc = 0L; var energy = 0L; var peak = 0L
        var i = 0
        while (i < a.samples.length) {
          val x = a.samples(i).toLong
          if (i > 0 && a.samples(i - 1).toLong * x < 0) zc += 1
          energy += x * x
          if (math.abs(x) > peak) peak = math.abs(x)
          i += 1
        }
        (r.doc_id, a.samples.length, zc, energy, peak)
      }.toDF("doc_id", "n_samples", "zero_crossings", "energy", "peak")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v, 40 + n % 61 AS ns FROM d),
      smp AS (SELECT doc_id, ns,
                     list_transform(range(ns),
                       i -> (v * 31 + i * 17) % 4001 - 2000) AS s
              FROM g)
      SELECT doc_id, ns AS n_samples,
             CAST(len(list_filter(range(1, ns), i -> s[i] * s[i + 1] < 0))
               AS BIGINT) AS zero_crossings,
             CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy,
             CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak
      FROM smp ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q148BmpDecode, q149WavDecode, q158BmpPool, q159WavFeatures)
}
