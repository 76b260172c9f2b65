package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{MediaCodecs, Multimodal}

/** Round-7 surface, first tranche: the PNG decode path made REAL — the
  * compressed-format sibling of the q148/q149/q197 roundtrips, closing the
  * round-6 verdict's one standing `partial` (compressed media fell back to
  * the deterministic stub).
  */
object Round7Queries {

  /** PNG roundtrip — the first COMPRESSED format on the real decode path:
    * per document, encode a (5..16)×(4..8) 8-bit RGB PNG whose logical row
    * y is the flat color (v+y, v+2y+1, v+3y+2), v < 200 so no channel
    * wraps, with the row FILTER TYPE cycling 0..4 (None/Sub/Up/Average/
    * Paeth — every decoder unfilter path participates in the oracle
    * check), then REALLY decode it ([[MediaCodecs.decodePng]]: CRC'd chunk
    * walk → JDK-Inflater IDAT → per-row unfilter, via
    * [[Multimodal.decodeFeatures]]'s sniffing chain) and emit header dims
    * plus the order-sensitive pixel statistics of the q148 protocol. The
    * DuckDB oracle predicts every column from the documents table alone —
    * the encoder and decoder share nothing beyond the public format spec,
    * so a wrong Paeth tiebreak, an off-by-one scanline, or a skipped
    * filter byte all land in the hash comparison. (file_bytes is NOT
    * emitted: deflate output size is not SQL-predictable — the one
    * difference from the uncompressed roundtrips.)
    */
  val q200PngDecode: QueryDef = QueryDef(
    "q200_png_decode",
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
        val bytes = MediaCodecs.encodePng(w, h,
          (_, y) => (r.v + y, r.v + 2 * y + 1, r.v + 3 * y + 2),
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

  /** Compressed TEXT ingest — the lake-default path the parquet fixtures
    * never exercise: the documents table round-trips through
    * gzip-compressed JSON-lines files (written eagerly by the query, read
    * back with `spark.read.json` — Hadoop's codec resolution picks gzip
    * off the `.gz` suffix, nothing is configured), then exact dedup runs
    * on what came back. The oracle is q24's over the ORIGINAL parquet, so
    * any corruption in the encode→compress→decompress→parse chain (JSON
    * escaping of control chars, charset, a truncated stream) lands in the
    * hash comparison.
    *
    * Splittability note (SCALE.md §gzip): a .gz text file is ONE input
    * split no matter its size — parallelism at read time equals the file
    * count, so the writer's partitioning (here: the upstream shuffle's 32
    * files) IS the read-side parallelism knob. At 100 TB keep compressed
    * text shards at a few hundred MB, or use bzip2 (splittable) or a
    * container format (parquet+zstd) instead.
    */
  val q203GzipIngest: QueryDef = QueryDef(
    "q203_gzip_ingest",
    (s, dir) => {
      // memoized dump (graft.sources.CompressedIngest): repeats measure
      // the gzip READ path, not a rewrite of identical bytes
      val back = graft.sources.CompressedIngest.documentsRoundTrip(s, dir, "gzip")
      graft.operators.Dedup.exactDedup(back).orderBy("keep_doc_id")
    },
    Some("""
      SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_doc_id"""))

  val all: Seq[QueryDef] = Seq(q200PngDecode, q203GzipIngest)
}
