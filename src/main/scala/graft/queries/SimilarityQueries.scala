package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Multimodal, Similarity}

/** Oracle-checked similarity-search surface over `embeddings`
  * (array<float>, dim 64): brute-force cosine top-k, IVF-style label-probed
  * top-k, embedding near-dup pairs, and a binary/multimodal metadata
  * projection. Operators in graft.operators.Similarity.
  */
object SimilarityQueries {

  /** DuckDB fragment: sequential-fold dot product of two FLOAT[] columns in
    * double precision — matches VectorFunctions' left fold bit-for-bit.
    */
  private[queries] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       |  i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin.replace("\n", " ")

  private[queries] def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  private[queries] def rdet6(e: String): String = s"floor(($e) * 1e6 + 0.5) / 1e6"

  val q33KnnBrute: QueryDef = QueryDef(
    "q33_knn_brute",
    (s, dir) => Similarity.topKBrute(Tables.load(s, dir, "embeddings"), nQueries = 10, k = 5)
      .orderBy("q_id", "rk"),
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
      sc AS (SELECT q_id, vec_id, ${rdet6(cosSql("embedding", "q_emb"))} AS cos
             FROM embeddings, q WHERE vec_id <> q_id)
      SELECT q_id, rk, vec_id, cos FROM (
        SELECT q_id, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
        FROM sc)
      WHERE rk <= 5 ORDER BY q_id, rk"""))

  val q34KnnIvfLabel: QueryDef = QueryDef(
    "q34_knn_ivf_label",
    (s, dir) => Similarity.topKByLabel(Tables.load(s, dir, "embeddings"), nQueries = 10, k = 5)
      .orderBy("q_id", "rk"),
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
                 FROM embeddings WHERE vec_id < 10),
      sc AS (SELECT q_id, vec_id, ${rdet6(cosSql("embedding", "q_emb"))} AS cos
             FROM embeddings, q WHERE label = q_label AND vec_id <> q_id)
      SELECT q_id, rk, vec_id, cos FROM (
        SELECT q_id, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
        FROM sc)
      WHERE rk <= 5 ORDER BY q_id, rk"""))

  val q35EmbeddingDup: QueryDef = QueryDef(
    "q35_dedup_embedding",
    (s, dir) => Similarity.embeddingDupPairs(Tables.load(s, dir, "embeddings"), threshold = 0.35)
      .orderBy("vec_a", "vec_b"),
    Some(s"""
      SELECT vec_a, vec_b, cos FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ${rdet6(cosSql("a.embedding", "b.embedding"))} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE cos >= 0.35e0 ORDER BY vec_a, vec_b"""))

  /** Sign-LSH bucketed ANN: candidates share the query's 8-plane bucket.
    * The hyperplane literals are generated from the same seed-fixed matrix
    * the Spark side uses, so bucket ids agree bit-for-bit.
    */
  val q37KnnLshBucket: QueryDef = QueryDef(
    "q49_knn_lsh_bucket",
    (s, dir) => Similarity.topKLshBucket(Tables.load(s, dir, "embeddings"), nQueries = 10, k = 3)
      .orderBy("q_id", "rk"),
    Some {
      def planeLit(h: Array[Double]): String =
        h.map(v => if (v > 0) "1.0e0" else "-1.0e0").mkString("[", ", ", "]")
      val bucket = Similarity.Hyperplanes.zipWithIndex.map { case (h, j) =>
        s"""CASE WHEN list_reduce(list_transform(generate_series(1, 64),
           |  i -> embedding[i]::DOUBLE * (${planeLit(h)})[i]), (x, y) -> x + y) > 0.0e0
           |  THEN ${1 << j} ELSE 0 END""".stripMargin.replace("\n", " ")
      }.mkString(" + ")
      s"""
      WITH c AS (SELECT vec_id, embedding, ($bucket) AS bucket FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM c WHERE vec_id < 10),
      sc AS (SELECT q_id, vec_id, ${rdet6(cosSql("c.embedding", "q_emb"))} AS cos
             FROM c JOIN q USING (bucket) WHERE vec_id <> q_id)
      SELECT q_id, rk, vec_id, cos FROM (
        SELECT q_id, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
        FROM sc)
      WHERE rk <= 3 ORDER BY q_id, rk"""
    })

  /** Multimodal batched decode over a MIXED corpus — the honest decode
    * contract: even docs carry a REAL PCM16 WAV payload (samples minted
    * closed-form from the doc, decoded by the actual RIFF walk in
    * [[graft.operators.MediaCodecs.decodeWavPcm16]]); odd docs carry bytes
    * no codec parses, and every decode column surfaces as an EXPLICIT NULL
    * — the engine never fabricates features for payloads it cannot decode
    * (`WHERE width IS NULL` is a curation pipeline's reject queue). The
    * oracle recomputes the WAV sample statistics from `documents` alone
    * and pins the null pattern doc-by-doc.
    */
  val q38MultimodalDecode: QueryDef = QueryDef(
    "q50_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        if (r.doc_id % 2 == 0) {
          val ns = 12 + r.n % 9
          val samples = Array.tabulate(ns)(i =>
            ((r.v * 37 + i * 101) % 8191 - 4095).toShort)
          val bytes = graft.operators.MediaCodecs.encodeWavPcm16(16000, samples)
          graft.operators.Multimodal.MediaRow(r.doc_id, bytes,
            graft.operators.Multimodal.MediaMeta("wav", bytes.length, 0L))
        } else {
          // deliberately UNDECODABLE: 'x' leader matches no codec magic
          val nb = 10 + r.n % 50
          val bytes = Array.tabulate(nb)(i =>
            if (i == 0) 'x'.toByte else ((r.v + i) % 251).toByte)
          graft.operators.Multimodal.MediaRow(r.doc_id, bytes,
            graft.operators.Multimodal.MediaMeta("unknown", bytes.length, 0L))
        }
      }
      graft.operators.Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"),
          col("width").isNotNull.as("decoded"),
          col("width").as("n_samples"),
          col("channels"),
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
      g AS (SELECT doc_id, v, 12 + n % 9 AS ns, doc_id % 2 = 0 AS dec FROM d),
      e AS (SELECT doc_id, ns, dec,
                   list_transform(range(ns),
                                  i -> (v * 37 + i * 101) % 8191 - 4095) AS s
            FROM g)
      SELECT doc_id,
             dec AS decoded,
             CASE WHEN dec THEN CAST(ns AS INTEGER) END AS n_samples,
             CASE WHEN dec THEN 1 END AS channels,
             CASE WHEN dec THEN CAST(16000 AS BIGINT) END AS sample_rate,
             CASE WHEN dec THEN CAST(s[1] AS BIGINT) END AS first_sample,
             CASE WHEN dec THEN CAST(list_sum(s) AS BIGINT) END AS sum_samples,
             CASE WHEN dec THEN CAST(list_sum(list_transform(range(ns),
               i -> (i + 1) * s[i + 1])) AS BIGINT) END AS wsum_samples
      FROM e ORDER BY doc_id"""))

  /** Multimodal column plumbing: byte length, portable checksum, and a
    * first-byte "format sniff" over the text treated as an opaque payload
    * (the real binary decode path lives in graft.operators.Multimodal).
    */
  val q36MultimodalMeta: QueryDef = QueryDef(
    "q36_multimodal_meta",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        graft.functions.HashFunctions.hash32(col("text")).as("checksum"),
        when(substring(col("text"), 1, 1).isin("a", "e", "i", "o", "u"), "vowel")
          .otherwise("other").as("kind"))
      .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             (('0x' || substr(md5(text), 1, 8))::BIGINT) AS checksum,
             CASE WHEN substr(text, 1, 1) IN ('a', 'e', 'i', 'o', 'u')
                  THEN 'vowel' ELSE 'other' END AS kind
      FROM documents ORDER BY doc_id"""))

  /** PQ-style quantization codes (8 subvectors x 2-bit sign codes), with the
    * per-code population as a window count. The hyperplane literals come
    * from the same seed-fixed matrix as the Spark side.
    */
  /** DuckDB expression computing [[Similarity.pqCode]] over a column named
    * `embedding` — the seed-fixed hyperplane matrix rendered as literals so
    * both engines quantize identically (shared by q62 and q301).
    */
  private[queries] lazy val pqCodeSql: String = {
    def planeLit(h: Array[Double]): String =
      h.map(v => if (v > 0) "1.0e0" else "-1.0e0").mkString("[", ", ", "]")
    (for {
      sub <- 0 until 8
      b <- 0 until 2
    } yield {
      val dot = s"""list_reduce(list_transform(generate_series(1, 8),
        | i -> (list_slice(embedding, ${sub * 8 + 1}, ${sub * 8 + 8}))[i]::DOUBLE
        |      * (${planeLit(Similarity.PqPlanes(sub)(b))})[i]), (x, y) -> x + y)"""
        .stripMargin.replace("\n", " ")
      s"CASE WHEN $dot > 0.0e0 THEN ${1 << (2 * sub + b)} ELSE 0 END"
    }).mkString(" + ")
  }

  val q62PqCodes: QueryDef = QueryDef(
    "q62_pq_codes",
    (s, dir) => Similarity.pqQuantize(Tables.load(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some {
      s"""
      SELECT vec_id, label, pq_code,
             count(*) OVER (PARTITION BY pq_code) AS n_same_code
      FROM (SELECT vec_id, label, ($pqCodeSql) AS pq_code FROM embeddings)
      ORDER BY vec_id"""
    })

  /** Multimodal resize plumbing (operators.Multimodal.resize): binary in →
    * stride-resampled binary out, metadata recomputed. The oracle checks the
    * public contract — resampled length and the portable byte-sum checksum.
    * The Spark side resamples UTF-8 BYTES while SQL-side per-byte access is
    * only practical over characters, so both sides filter to pure-ASCII
    * rows (octet_length == char length ⇒ byte i == codepoint i) — the query
    * is data-independent rather than fixture-trusting.
    */
  val q108MultimodalResize: QueryDef = QueryDef(
    "q108_multimodal_resize",
    (s, dir) => {
      val ascii7 = Tables.load(s, dir, "documents")
        .filter(octet_length(col("text")) === length(col("text")))
      Multimodal.resize(Multimodal.attachPayload(ascii7), 256).toDF()
        .select(col("doc_id"), col("meta.nBytes").as("n_resized"),
          col("meta.checksum").as("resized_checksum"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents
                 WHERE octet_length(encode(text)) = length(text)),
      s AS (SELECT doc_id, text, n,
              greatest(1, (n + 255) // 256) AS stride FROM t)
      SELECT doc_id,
             CAST(CASE WHEN n = 0 THEN 0 ELSE ((n - 1) // stride) + 1 END
               AS INTEGER) AS n_resized,
             CAST(COALESCE(list_sum(list_transform(generate_series(1, n, stride),
               p -> ascii(substr(text, p, 1)))), 0) % 2147483647 AS BIGINT)
               AS resized_checksum
      FROM s ORDER BY doc_id"""))

  /** ANN RECALL measurement — the quality gauge every approximate index
    * needs beside its speed numbers: per query, recall@5 of the
    * label-probed IVF search (q34's operator) against the brute-force
    * ground truth (q33's). An ANN deployment that never measures recall
    * is flying blind; this runs the measurement as a QUERY — both
    * searches are the existing operators (queries broadcast, corpus never
    * shuffles for the probe), the comparison is a per-query left join +
    * count over 2×(nQueries×k) rows, driver sees nothing. recall_e4 is
    * exact integer (hits × 10⁴ / k with k = 5 → hits × 2000).
    */
  val q157AnnRecall: QueryDef = QueryDef(
    "q157_ann_recall",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val brute = Similarity.topKBrute(e, nQueries = 10, k = 5)
        .select(col("q_id"), col("vec_id"))
      val probed = Similarity.topKByLabel(e, nQueries = 10, k = 5)
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      brute.join(probed, Seq("q_id", "vec_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .withColumn("recall_e4", col("n_hits") * 2000L)
        .orderBy("q_id")
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
                 FROM embeddings WHERE vec_id < 10),
      bsc AS (SELECT q_id, vec_id, ${rdet6(cosSql("embedding", "q_emb"))} AS cos
              FROM embeddings, q WHERE vec_id <> q_id),
      brute AS (SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
                  FROM bsc) WHERE rk <= 5),
      lsc AS (SELECT q_id, vec_id, ${rdet6(cosSql("embedding", "q_emb"))} AS cos
              FROM embeddings, q WHERE label = q_label AND vec_id <> q_id),
      probed AS (SELECT q_id, vec_id FROM (
                   SELECT q_id, vec_id,
                          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
                   FROM lsc) WHERE rk <= 5)
      SELECT brute.q_id AS q_id,
             CAST(SUM(CASE WHEN probed.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hits,
             CAST(SUM(CASE WHEN probed.vec_id IS NULL THEN 0 ELSE 1 END) * 2000 AS BIGINT)
               AS recall_e4
      FROM brute LEFT JOIN probed
        ON brute.q_id = probed.q_id AND brute.vec_id = probed.vec_id
      GROUP BY 1 ORDER BY q_id"""))

  val all: Seq[QueryDef] = Seq(q33KnnBrute, q34KnnIvfLabel, q35EmbeddingDup,
    q36MultimodalMeta, q37KnnLshBucket, q38MultimodalDecode, q62PqCodes,
    q108MultimodalResize, q157AnnRecall)
}
