package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{Dedup, MediaCodecs, ScopedCache, Similarity}

/** Round-13 additions, second tranche: the curation-adjacent operators a
  * training-data pipeline runs between ingest and packing — perceptual
  * image near-dup (real decode in the loop), semantic dedup over trained
  * clusters (SemDeDup), two embedding-compression audits (matryoshka
  * truncation, symmetric-integer quantization), and marginal-novelty data
  * valuation. Every query pairs a Spark plan that holds at corpus scale
  * (banded/blocked joins, broadcast query sides, hash aggregates) with a
  * closed-form DuckDB oracle.
  */
object Round13Queries2 {

  /** Closed-form gray level of dHash grid cell (bx, by) for a document in
    * perturbation class `c` of group `g` — the oracle-side twin of the
    * pixel formula q331's encoder draws: squared-mix hash for the base
    * pattern (distinct across groups: measured min cross-group Hamming 14
    * over all 150 classes), saturated 255 cells for the perturbations
    * (which flip 0–2 of the two comparators each touches, so same-group
    * classes land at Hamming 0..6).
    */
  private def graySql(bx: String, by: String): String = {
    val x = s"((g + 1) * 1000003 + ($bx) * 8191 + ($by) * 127)"
    s"""CASE WHEN c = 1 AND ($bx) = 3 AND ($by) = 4 THEN 255
       |WHEN c = 2 AND ((($bx) = 1 AND ($by) = 2) OR (($bx) = 5 AND ($by) = 6)) THEN 255
       |ELSE (($x * $x) % 999983 % 31) * 8 END""".stripMargin.replace("\n", " ")
  }

  /** The dHash table (doc_id, sim64) q331 pairs over — REAL BMP encode +
    * decode per document; shared with the cross-modal consensus audit.
    */
  private[queries] def phashTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val src = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("int").as("n"),
        pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
      .as[Round5Queries6.MediaSrc]
    src.map { r =>
      val g = r.v % 50
      val c = r.n % 3
      def gray(bx: Int, by: Int): Int =
        if (c == 1 && bx == 3 && by == 4) 255
        else if (c == 2 && ((bx == 1 && by == 2) || (bx == 5 && by == 6))) 255
        else {
          val x = (g + 1).toLong * 1000003L + bx * 8191L + by * 127L
          (x * x % 999983L % 31L).toInt * 8
        }
      val bytes = MediaCodecs.encodeBmp24(18, 16, (x, y) => {
        val lvl = gray(x / 2, y / 2); (lvl, lvl, lvl)
      })
      val img = MediaCodecs.decodeBmp24(bytes)
        .getOrElse(sys.error(s"synth bmp failed to decode: doc ${r.doc_id}"))
      (r.doc_id, MediaCodecs.dHash64(img, 2, 2))
    }.toDF("doc_id", "sim64")
  }

  /** Oracle CTE chain producing `pcand(doc_a, doc_b, alo, ahi, blo, bhi)`
    * — the closed-form dHash banded candidates (names prefixed `p*` so
    * the chain composes with the audio chain in one statement).
    */
  private[queries] def phashCandCtes: String = {
    def bitSql(i: String): String =
      s"CASE WHEN ${graySql(s"($i) % 8 + 1", s"($i) // 8")} > " +
        s"${graySql(s"($i) % 8", s"($i) // 8")} THEN 1::BIGINT ELSE 0::BIGINT END"
    s"""pd AS (SELECT doc_id,
                      CAST(octet_length(encode(text)) AS INTEGER) % 3 AS c,
                      CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                        AS INTEGER) % 50 AS g
               FROM documents),
    ph AS (SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 32),
                   i -> (${bitSql("i")}) << i)) AS BIGINT) AS lo,
                 CAST(list_sum(list_transform(range(32, 64),
                   i -> (${bitSql("i")}) << (i - 32))) AS BIGINT) AS hi
          FROM pd),
    pbx AS (SELECT doc_id, lo, hi, u.j,
                   CASE u.j WHEN 0 THEN lo & 65535
                            WHEN 1 THEN (lo >> 16) & 65535
                            WHEN 2 THEN hi & 65535
                            ELSE (hi >> 16) & 65535 END AS bv
            FROM ph, unnest([0, 1, 2, 3]) AS u(j)),
    pcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
             FROM pbx a JOIN pbx b
               ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)"""
  }

  /** PERCEPTUAL-HASH IMAGE NEAR-DUP — image dedup with the REAL codec in
    * the loop: per document, a deterministic 18×16 24-bit BMP (gray level
    * constant per 2×2 cell, drawn from the document's (group, class) =
    * (v%50, n%3)) is encoded, decoded back through
    * [[graft.operators.MediaCodecs.decodeBmp24]] (bottom-up rows, BGR
    * swizzle, row padding all load-bearing), reduced to a 9×8 brightness
    * grid, and hashed to the classic 64-bit dHash
    * ([[graft.operators.MediaCodecs.dHash64]]). Candidate pairs come from
    * [[graft.operators.Dedup.banded64Pairs]] — the same four-16-bit-band
    * pigeonhole join the simhash family uses (Hamming ≤ 3 ⟹ one band
    * intact), so the corpus square never materializes — then the exact
    * popcount filter keeps pairs at Hamming ≤ 2. The oracle recomputes
    * the hash closed-form from the pixel formula (as two 32-bit halves —
    * BIGINT-safe) and mirrors the banded join, so a decoder defect, a
    * grid-sum error, or a band split off by one lands in the hash.
    */
  val q331PhashNearDup: QueryDef = QueryDef(
    "q331_phash_neardup",
    (s, dir) => Dedup.banded64Pairs(phashTable(s, dir), maxHamming = 2)
      .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $phashCandCtes
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
               AS INTEGER) AS hamming
      FROM pcand
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2
      ORDER BY doc_a, doc_b"""))

  /** SEMANTIC DEDUP (SemDeDup) — embedding-space dedup blocked by a
    * TRAINED coarse quantizer instead of a given label, through the
    * first-class [[graft.operators.Similarity.semanticDedup]] operator
    * (round 14: the quantizer k is DERIVED from the corpus size —
    * k = max(4, ⌈n/512⌉) — so within-cluster pair mass stays ~n·512 as
    * the corpus grows instead of Σc² → n², and the dominator side is
    * capped per cluster with an observable drop count; CorpusScaleBench
    * measures the bounded pair mass on the 50× replica corpus). At every
    * fixture scale n ≤ 2048, so k = 4 and the cap never binds — the
    * oracle's unrolled k=4 Lloyd chain (the q70 CTE arithmetic) plus the
    * dominance rule replays the exact same computation; stale centroids
    * or a wrong-side tie both surface.
    */
  val q332SemanticDedup: QueryDef = QueryDef(
    "q332_semantic_dedup",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      // The oracle below unrolls a k=4 Lloyd chain, valid only while the
      // derived k = max(4, ceil(n/512)) equals 4, i.e. n <= 2048. Fail
      // loudly AT THE SOURCE if a fixture outgrows that, instead of a
      // confusing hash mismatch far from the cause.
      val n = e.count()
      require(n <= 2048,
        s"q332 oracle hard-pins k=4 (kmeansCtes(4,2,64)) but embeddings has " +
          s"$n rows => semanticDedup derives k=${math.max(4L, (n + 511) / 512)}; " +
          "re-derive the oracle CTE chain for the new k before scaling the fixture")
      Similarity.semanticDedup(e,
          targetClusterSize = 512, maxDominators = 4096, threshold = 0.35d)
        .orderBy("vec_id")
    },
    Some(s"""
      WITH ${ExtQueries.kmeansCtes(4, 2, 64)},
      dom AS (SELECT DISTINCT b.vec_id
              FROM af a JOIN af b
                ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              WHERE ${SimilarityQueries.rdet6(
                SimilarityQueries.cosSql("a.embedding", "b.embedding"))} >= 0.35e0)
      SELECT af.vec_id, af.cluster,
             CAST(CASE WHEN dom.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS kept
      FROM af LEFT JOIN dom ON af.vec_id = dom.vec_id
      ORDER BY af.vec_id"""))

  private def dotDSql(a: String, b: String, d: Int): String =
    s"""list_reduce(list_transform(generate_series(1, $d),
       |  i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin.replace("\n", " ")

  private def cosDSql(a: String, b: String, d: Int): String =
    SimilarityQueries.rdet6(
      s"(${dotDSql(a, b, d)} / (sqrt(${dotDSql(a, a, d)}) * sqrt(${dotDSql(b, b, d)})))")

  /** MATRYOSHKA TRUNCATION RECALL — the embedding-compression knob audit:
    * exact top-10 by cosine over only the FIRST d dimensions (d = 8, 16,
    * 32, 64) against the full-precision top-10, per query. The S-curve
    * (recall rises toward 1000 as d grows; d=64 is the identity row) is
    * the number a pipeline reads before deciding how many dimensions the
    * ANN index stores — at 100 TB, halving stored dimensions halves
    * stage-1 index IO. Query side broadcast, ground truth computed once
    * and ScopedCache'd across the four variants.
    */
  val q333MatryoshkaRecall: QueryDef = QueryDef(
    "q333_matryoshka_recall",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val brute = Similarity.topKBrute(e, nQueries = 10, k = 10)
        .select(col("q_id"), col("vec_id"))
        .transform(ScopedCache.cache)
      val qs = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"))
      Seq(8, 16, 32, 64).map { d =>
        val trunc = e.select(col("vec_id"),
          slice(col("embedding"), 1, d).as("embedding"))
        val t = Similarity.topKBrute(trunc, nQueries = 10, k = 10)
          .select(col("q_id"), col("vec_id"))
        val hits = brute.join(t, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
        qs.join(hits, Seq("q_id"), "left").na.fill(0L, Seq("n_hits"))
          .select(lit(d).as("dim"), col("q_id"), col("n_hits"),
            (col("n_hits") * 100L).as("recall_e3"))
      }.reduce(_ unionAll _).orderBy("dim", "q_id")
    },
    Some {
      val variants = Seq(8, 16, 32, 64).map { d =>
        s"""SELECT CAST($d AS INTEGER) AS dim, q.q_id,
           |       COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
           |       COALESCE(h.n_hits, CAST(0 AS BIGINT)) * 100 AS recall_e3
           |FROM q LEFT JOIN (
           |  SELECT t.q_id, CAST(count(*) AS BIGINT) AS n_hits
           |  FROM brute b
           |  JOIN (SELECT q_id, vec_id FROM (
           |          SELECT q.q_id, c.vec_id,
           |                 row_number() OVER (PARTITION BY q.q_id
           |                   ORDER BY ${cosDSql("c.embedding", "q.q_emb", d)} DESC,
           |                            c.vec_id) AS rk
           |          FROM q, e c WHERE c.vec_id <> q.q_id) WHERE rk <= 10) t
           |    ON b.q_id = t.q_id AND b.vec_id = t.vec_id
           |  GROUP BY t.q_id) h ON h.q_id = q.q_id""".stripMargin.replace("\n", " ")
      }.mkString("\nUNION ALL\n")
      s"""
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 10),
      brute AS (SELECT q_id, vec_id FROM (
          SELECT q.q_id, c.vec_id,
                 row_number() OVER (PARTITION BY q.q_id
                   ORDER BY ${cosDSql("c.embedding", "q.q_emb", 64)} DESC,
                            c.vec_id) AS rk
          FROM q, e c WHERE c.vec_id <> q.q_id) WHERE rk <= 10)
      $variants
      ORDER BY dim, q_id"""
    })

  /** SYMMETRIC-INTEGER QUANTIZATION RECALL — the other compression axis:
    * per-vector symmetric quantization to b = 2/4/8 bits (scale s =
    * qmax/max|x|, round-half-up, reconstruct q/s — both query and corpus
    * quantized), exact top-10 over the reconstructed vectors vs the
    * full-precision top-10. Rounding is floor(x·s + 0.5) in DOUBLE on
    * both engines, and ranking runs on the 6-decimal-rounded cosine with
    * vec_id tiebreak, so the heavy tie mass at b=2 (three representable
    * levels per vector) stays deterministic. The at-scale claim this
    * audits: int8 reconstruction is recall-lossless here, so the vector
    * table can store 1/4 the bytes and stage-2 rerank IO drops 4×.
    */
  val q334QuantRecall: QueryDef = QueryDef(
    "q334_quantization_recall",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val brute = Similarity.topKBrute(e, nQueries = 10, k = 10)
        .select(col("q_id"), col("vec_id"))
        .transform(ScopedCache.cache)
      val base = e.withColumn("ma",
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
            " (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
        .filter(col("ma") > 0d)
        .transform(ScopedCache.cache)
      val qs = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"))
      Seq(2, 4, 8).map { bits =>
        val qmax = (1 << (bits - 1)) - 1
        val rec = base.select(col("vec_id"),
          expr(s"transform(embedding, x -> floor(CAST(x AS DOUBLE)" +
            s" * (CAST($qmax AS DOUBLE) / ma) + 0.5D)" +
            s" / (CAST($qmax AS DOUBLE) / ma))").as("embedding"))
        val t = Similarity.topKBrute(rec, nQueries = 10, k = 10)
          .select(col("q_id"), col("vec_id"))
        val hits = brute.join(t, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
        qs.join(hits, Seq("q_id"), "left").na.fill(0L, Seq("n_hits"))
          .select(lit(bits).as("bits"), col("q_id"), col("n_hits"),
            (col("n_hits") * 100L).as("recall_e3"))
      }.reduce(_ unionAll _).orderBy("bits", "q_id")
    },
    Some {
      val variants = Seq(2, 4, 8).map { bits =>
        val qmax = (1 << (bits - 1)) - 1
        val recEmb = s"list_transform(embedding, x -> floor(x::DOUBLE" +
          s" * (CAST($qmax AS DOUBLE) / ma) + 0.5e0)" +
          s" / (CAST($qmax AS DOUBLE) / ma))"
        s"""SELECT CAST($bits AS INTEGER) AS bits, q.q_id,
           |       COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
           |       COALESCE(h.n_hits, CAST(0 AS BIGINT)) * 100 AS recall_e3
           |FROM q LEFT JOIN (
           |  SELECT t.q_id, CAST(count(*) AS BIGINT) AS n_hits
           |  FROM brute b
           |  JOIN (SELECT q_id, vec_id FROM (
           |          SELECT qr.q_id, cr.vec_id,
           |                 row_number() OVER (PARTITION BY qr.q_id
           |                   ORDER BY ${cosDSql("cr.embedding", "qr.q_emb", 64)} DESC,
           |                            cr.vec_id) AS rk
           |          FROM (SELECT vec_id AS q_id, $recEmb AS q_emb
           |                FROM base WHERE vec_id < 10) qr,
           |               (SELECT vec_id, $recEmb AS embedding FROM base) cr
           |          WHERE cr.vec_id <> qr.q_id) WHERE rk <= 10) t
           |    ON b.q_id = t.q_id AND b.vec_id = t.vec_id
           |  GROUP BY t.q_id) h ON h.q_id = q.q_id""".stripMargin.replace("\n", " ")
      }.mkString("\nUNION ALL\n")
      s"""
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 10),
      base AS (SELECT vec_id, embedding,
                      list_reduce(list_transform(embedding, x -> abs(x::DOUBLE)),
                        (a, b) -> greatest(a, b)) AS ma
               FROM e
               WHERE list_reduce(list_transform(embedding, x -> abs(x::DOUBLE)),
                       (a, b) -> greatest(a, b)) > 0e0),
      brute AS (SELECT q_id, vec_id FROM (
          SELECT q.q_id, c.vec_id,
                 row_number() OVER (PARTITION BY q.q_id
                   ORDER BY ${cosDSql("c.embedding", "q.q_emb", 64)} DESC,
                            c.vec_id) AS rk
          FROM q, e c WHERE c.vec_id <> q.q_id) WHERE rk <= 10)
      $variants
      ORDER BY bits, q_id"""
    })

  /** MARGINAL-NOVELTY DATA VALUATION — per document, how many of its
    * distinct 5-grams appear in NO lower-id document (the document's
    * marginal contribution to corpus n-gram coverage — the greedy
    * facility-location score data-selection methods rank by). One explode
    * to the distinct (doc, gram) relation, one hash aggregate for each
    * gram's first-owner, one equi-join back: corpus-wide state reached by
    * shuffle on the gram hash, never doc×doc. Documents under 5 words
    * keep zero counts.
    */
  val q335NoveltyGain: QueryDef = QueryDef(
    "q335_novelty_gain",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val grams = d.filter(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"),
          explode(graft.plans.WordGrams(col("text"), 5, ' ')).as("gram"))
        .distinct()
        .transform(ScopedCache.cache)
      val first = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
      val per = grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      d.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_grams", "n_novel"))
        .withColumn("novelty_e3",
          expr("n_novel * 1000 div greatest(n_grams, 1)"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id,
                   array_to_string(list_slice(ws, i + 1, i + 5), ' ') AS gram
            FROM d, unnest(range(0, len(ws) - 4)) AS u(i)
            WHERE len(ws) >= 5),
      f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1),
      per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_novel
              FROM g JOIN f USING (gram) GROUP BY 1)
      SELECT d.doc_id,
             COALESCE(per.n_grams, CAST(0 AS BIGINT)) AS n_grams,
             COALESCE(per.n_novel, CAST(0 AS BIGINT)) AS n_novel,
             COALESCE((per.n_novel * 1000) // greatest(per.n_grams, 1),
                      CAST(0 AS BIGINT)) AS novelty_e3
      FROM d LEFT JOIN per USING (doc_id)
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q331PhashNearDup, q332SemanticDedup,
    q333MatryoshkaRecall, q334QuantRecall, q335NoveltyGain)
}
