package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions.MinhashParams
import graft.operators.Dedup

/** Oracle-checked dedup surface over the `documents` table: exact,
  * MinHash-LSH, SimHash, and n-gram Jaccard (operators in
  * graft.operators.Dedup). The oracle SQL mirrors every hash arithmetic step
  * via md5 (see graft.functions.HashFunctions).
  */
object DedupQueries {

  /** DuckDB fragment: hash32 of a string expression. */
  private[queries] def h32(x: String): String = s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  /** DuckDB CTEs: w = tokens (+n_chars), s = distinct 3-gram shingles. */
  private[queries] val shingleCtes = """
    w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, n_chars,
            list_distinct(list_transform(generate_series(1, len(w)-2),
              i -> array_to_string(list_slice(w, i, i+2), ' '))) AS sh
          FROM w WHERE len(w) >= 3)"""

  private[queries] def sigExpr(i: Int): String = {
    val (a, b) = MinhashParams(i)
    s"list_min(list_transform(sh, t -> ($a * ${h32("t")} + $b) % 2147483647))"
  }

  /** DuckDB fragment: n-bit simhash pack of a hash-list column, bits shifted
    * up by `base` (mirrors Dedup.simhash64Table's two 32/31-bit halves).
    */
  private[queries] def simExpr(h: String, base: Int, n: Int): String =
    s"""CAST(list_aggregate(list_transform(range(0, $n), b ->
       |  CASE WHEN list_aggregate(list_transform($h, x ->
       |         CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
       |       THEN (1::BIGINT << (b + $base)) ELSE 0::BIGINT END), 'sum') AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  val q24DedupExact: QueryDef = QueryDef(
    "q24_dedup_exact",
    (s, dir) => Dedup.exactDedup(Tables.load(s, dir, "documents")).orderBy("keep_doc_id"),
    Some("""
      SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_doc_id"""))

  val q25MinhashSignatures: QueryDef = QueryDef(
    "q25_minhash_signatures",
    (s, dir) => Dedup.minhashSignatures(Tables.load(s, dir, "documents"), 3).orderBy("doc_id"),
    Some(s"""
      WITH $shingleCtes
      SELECT doc_id,
             ${(0 until 8).map(i => s"${sigExpr(i)} AS sig_$i").mkString(",\n             ")}
      FROM s ORDER BY doc_id"""))

  val q26MinhashLsh: QueryDef = QueryDef(
    "q26_dedup_minhash_lsh",
    (s, dir) => Dedup.minhashLsh(Tables.load(s, dir, "documents"),
      shingleK = 3, rowsPerBand = 2, threshold = 0.5).orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $shingleCtes,
      sig AS (SELECT doc_id,
                list_distinct(list_transform(sh, t -> ${h32("t")})) AS hs,
                [${(0 until 8).map(sigExpr).mkString(", ")}] AS sg FROM s),
      bands AS (SELECT doc_id, b,
                  sg[2*b+1]::VARCHAR || '_' || sg[2*b+2]::VARCHAR AS key
                FROM sig, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                 / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
        FROM cand JOIN sig sa ON sa.doc_id = doc_a
                  JOIN sig sb ON sb.doc_id = doc_b)
      WHERE jaccard >= 0.5e0 ORDER BY doc_a, doc_b"""))

  /** SimHash near-dup pairs with the length rule as a VERIFY-side predicate:
    * banded equi-join candidates (the q63 generator — guaranteed recall at
    * Hamming radius <= 3), then |Δn_chars| <= 16 filters verified pairs.
    * Round <= 4 blocked on length buckets instead (quadratic inside a
    * bucket — a skew cell whenever one document length is popular); the
    * banded generator's work tracks band-key collisions, never the length
    * histogram. Differs from q63 by exactly the length predicate.
    */
  val q27Simhash: QueryDef = QueryDef(
    "q27_dedup_simhash",
    (s, dir) => Dedup.simhashPairs(Tables.load(s, dir, "documents"),
      shingleK = 3, maxHamming = 3).orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $shingleCtes,
      hs AS (SELECT doc_id, n_chars,
               list_transform(sh, t -> (('0x' || substr(md5(t), 1, 8))::BIGINT)) AS lo,
               list_transform(sh, t -> (('0x' || substr(md5(t), 9, 8))::BIGINT)) AS hi
             FROM s),
      sim AS (SELECT doc_id, n_chars,
                ${simExpr("lo", 0, 32)} + ${simExpr("hi", 32, 31)} AS sim64
              FROM hs),
      bands AS (SELECT doc_id, n_chars, sim64, b, (sim64 >> (16 * b)) & 65535 AS key
                FROM sim, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.sim64 AS sa, b.sim64 AS sb,
                      a.n_chars AS nca, b.n_chars AS ncb
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
      FROM cand
      WHERE bit_count(xor(sa, sb)) <= 3 AND abs(nca - ncb) <= 16
      ORDER BY doc_a, doc_b"""))

  val q28NgramJaccard: QueryDef = QueryDef(
    "q28_dedup_ngram_jaccard",
    (s, dir) => Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"),
      shingleK = 3, threshold = 0.5).orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $shingleCtes,
      hsx AS (SELECT doc_id, n_chars,
                list_distinct(list_transform(sh, t -> ${h32("t")})) AS hs FROM s)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
        FROM hsx a JOIN hsx b
          ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 16)
      WHERE jaccard >= 0.5e0 ORDER BY doc_a, doc_b"""))

  /** Near-exact dedup by normalized-text fingerprint: collapses documents
    * whose canonical forms hash identically — one narrow hash-shuffle, no
    * pairwise work (the cheapest dedup tier between exact and MinHash).
    */
  val q56DedupFingerprint: QueryDef = QueryDef(
    "q56_dedup_fingerprint",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.operators.TextAnalysis.fingerprints(Tables.load(s, dir, "documents"))
        .groupBy("fp_full")
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .select("keep_doc_id", "n_copies", "fp_full")
        .orderBy("keep_doc_id")
    },
    Some("""
      WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
                 FROM documents),
      fp AS (SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(string_split(norm, ''), c -> ascii(c)::BIGINT)),
                 (a, c) -> (a * 31 + c) % 2147483647) AS fp_full
             FROM n WHERE length(norm) >= 5)
      SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies, fp_full
      FROM fp GROUP BY fp_full ORDER BY keep_doc_id"""))

  /** MOSS-style winnowing fingerprint sets (window 8 over 5-char grams). The
    * sorted fingerprint set is reduced to scalars (count, min, max, modular
    * checksum) — an array column would break the driver's comparator, and
    * the checksum pins every element anyway.
    */
  val q57Winnowing: QueryDef = QueryDef(
    "q57_winnowing",
    (s, dir) => graft.operators.Dedup.winnowFingerprints(
        Tables.load(s, dir, "documents"), window = 8)
      // explode + hash-agg, not aggregate(): higher-order-function lambdas
      // run interpreted per element (NOTES.md learning #7)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_fps"),
        min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"),
        pmod(sum(col("fp")), lit(2147483647L)).as("fp_checksum"))
      .orderBy("doc_id"),
    Some("""
      WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
                 FROM documents),
      g AS (SELECT doc_id,
              list_transform(generate_series(1, length(norm) - 4),
                i -> ascii(substr(norm, i, 1))::BIGINT * 923521
                   + ascii(substr(norm, i+1, 1))::BIGINT * 29791
                   + ascii(substr(norm, i+2, 1))::BIGINT * 961
                   + ascii(substr(norm, i+3, 1))::BIGINT * 31
                   + ascii(substr(norm, i+4, 1))::BIGINT) AS gh
            FROM n WHERE length(norm) >= 12),
      f AS (SELECT doc_id,
              list_sort(list_distinct(
                list_transform(generate_series(1, len(gh) - 7),
                  i -> list_min(list_slice(gh, i, i+7))))) AS fps
            FROM g)
      SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fps,
             fps[1] AS min_fp, fps[len(fps)] AS max_fp,
             CAST(list_aggregate(fps, 'sum') % 2147483647 AS BIGINT) AS fp_checksum
      FROM f ORDER BY doc_id"""))

  /** Connected-component dedup clusters over the LSH pair graph (Spark:
    * large-star/small-star contraction, [[graft.operators.Graph.connectedComponents]]
    * — O(log n) rounds; oracle: recursive CTE over the same pairs). The
    * q26 LSH CTEs are reused verbatim for the edge set.
    */
  val q58DedupClusters: QueryDef = QueryDef(
    "q58_dedup_clusters",
    (s, dir) => graft.operators.Dedup.dedupClusters(
      Tables.load(s, dir, "documents"), shingleK = 3, rowsPerBand = 2, threshold = 0.5)
      .orderBy("doc_id"),
    Some(s"""
      WITH RECURSIVE $clusterCtes
      SELECT doc_id, CAST(min(root) AS BIGINT) AS cluster_id
      FROM reach GROUP BY doc_id ORDER BY doc_id"""))

  /** The full connected-component chain (shingles → minhash bands →
    * verified pairs → symmetric edges → recursive reach) as CTE text —
    * shared by q58 (the labels) and q326 (the survivor policy over the
    * same labels), so the two can never disagree about the clustering.
    * Embed after `WITH RECURSIVE`; exposes `reach(doc_id, root)`.
    */
  private[queries] def clusterCtes: String = s"""$shingleCtes,
      sig AS (SELECT doc_id, sh, [${(0 until 8).map(sigExpr).mkString(", ")}] AS sg FROM s),
      bands AS (SELECT doc_id, b,
                  sg[2*b+1]::VARCHAR || '_' || sg[2*b+2]::VARCHAR AS key
                FROM sig, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
      hsx AS (SELECT doc_id, list_distinct(list_transform(sh, t -> ${h32("t")})) AS hs FROM s),
      pairs AS (SELECT doc_a, doc_b FROM (
                  SELECT doc_a, doc_b,
                         CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                           / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
                  FROM cand JOIN hsx sa ON sa.doc_id = doc_a
                            JOIN hsx sb ON sb.doc_id = doc_b)
                WHERE jaccard >= 0.5e0),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (SELECT doc_id, doc_id AS root FROM documents
                UNION
                SELECT e.dst AS doc_id, r.root
                FROM reach r JOIN edges e ON e.src = r.doc_id)"""

  /** Banded 63-bit simhash pairs: pure equi-join candidate generation with
    * guaranteed recall at Hamming radius <= 3 (pigeonhole over four 16-bit
    * bands) — the simhash scale path, no length heuristics.
    */
  val q63SimhashBanded: QueryDef = QueryDef(
    "q63_dedup_simhash_banded",
    (s, dir) => graft.operators.Dedup.simhash64BandedPairs(
      Tables.load(s, dir, "documents"), shingleK = 3).orderBy("doc_a", "doc_b"),
    Some {
      s"""
      WITH $shingleCtes,
      hs AS (SELECT doc_id,
               list_transform(sh, t -> (('0x' || substr(md5(t), 1, 8))::BIGINT)) AS lo,
               list_transform(sh, t -> (('0x' || substr(md5(t), 9, 8))::BIGINT)) AS hi
             FROM s),
      sim AS (SELECT doc_id,
                ${simExpr("lo", 0, 32)} + ${simExpr("hi", 32, 31)} AS sim64
              FROM hs),
      bands AS (SELECT doc_id, sim64, b, (sim64 >> (16 * b)) & 65535 AS key
                FROM sim, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.sim64 AS sa, b.sim64 AS sb
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
      FROM cand WHERE bit_count(xor(sa, sb)) <= 3
      ORDER BY doc_a, doc_b"""
    })

  /** INCREMENTAL dedup — the nightly-ingest shape: the NEW batch (every
    * 5th doc_id — a scale-factor-invariant 20% split) checks against the
    * HISTORY (the rest) via the NEW × OLD band join only; history never
    * pairs with itself. See [[graft.operators.Dedup.deltaDedupPairs]] for
    * the 100 TB posture (history's banded table = the persisted LSH index).
    */
  /** Shared by q150 (stateless recompute) and q202 (stored-index probe):
    * both produce the identical delta-vs-history near-dup pairs, so one
    * oracle pins both paths.
    */
  private val deltaPairsOracle = s"""
      WITH $shingleCtes,
      sig AS (SELECT doc_id,
                list_distinct(list_transform(sh, t -> ${h32("t")})) AS hs,
                [${(0 until 8).map(sigExpr).mkString(", ")}] AS sg FROM s),
      bands AS (SELECT doc_id, b,
                  sg[2*b+1]::VARCHAR || '_' || sg[2*b+2]::VARCHAR AS key
                FROM sig, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS old_doc
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key
               WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0)
      SELECT new_doc, old_doc, jaccard FROM (
        SELECT new_doc, old_doc,
               CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                 / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
        FROM cand JOIN sig sa ON sa.doc_id = new_doc
                  JOIN sig sb ON sb.doc_id = old_doc)
      WHERE jaccard >= 0.5e0 ORDER BY new_doc, old_doc"""

  val q150DeltaDedup: QueryDef = QueryDef(
    "q150_delta_dedup",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Dedup.deltaDedupPairs(
        d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0),
        shingleK = 3, rowsPerBand = 2, threshold = 0.5)
        .orderBy("new_doc", "old_doc")
    },
    Some(deltaPairsOracle))

  /** Persisted-LSH-index BUILD ([[graft.operators.Dedup.writeLshIndex]]):
    * history's hashed shingles and its banded signatures land in two
    * bucketed catalog tables, then the audit reads the INDEX back and
    * summarizes it per band — row count, distinct band keys, and a doc_id
    * checksum, every value predicted by the oracle from `documents` alone,
    * so a wrong signature, a dropped row, or a corrupted write all
    * hash-mismatch. The bucketed layout is what q202's probe exploits.
    */
  val q201LshIndexBuild: QueryDef = QueryDef(
    "q201_lsh_index_build",
    (s, dir) => {
      Dedup.writeLshIndex(
        Tables.load(s, dir, "documents").filter(col("doc_id") % 5 =!= 0),
        shingleK = 3, rowsPerBand = 2,
        indexTable = "graft_lsh_index_audit",
        shingleTable = "graft_lsh_shingles_audit")
      s.table("graft_lsh_index_audit")
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("key")).as("n_keys"),
          sum(col("doc_id")).as("doc_sum"))
        .orderBy("band")
    },
    Some(s"""
      WITH $shingleCtes,
      sig AS (SELECT doc_id, [${(0 until 8).map(sigExpr).mkString(", ")}] AS sg
              FROM s WHERE doc_id % 5 != 0),
      bands AS (SELECT doc_id, b,
                  sg[2*b+1]::VARCHAR || '_' || sg[2*b+2]::VARCHAR AS key
                FROM sig, generate_series(0, 3) g(b))
      SELECT CAST(b AS INTEGER) AS band,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
             CAST(sum(doc_id) AS BIGINT) AS doc_sum
      FROM bands GROUP BY b ORDER BY band"""))

  /** Persisted-LSH-index PROBE — the other half of the lifecycle q150
    * recomputes statelessly: ensure the index tables exist for history
    * ([[graft.operators.Dedup.ensureLshIndex]] — the build runs on the
    * FIRST invocation only; repeats detect the stored shingle table still
    * matches history's eligible-doc count and skip straight to the probe,
    * so a bench repeat times the stored-index path this query advertises,
    * not a nightly rebuild), then answer the delta entirely from the
    * STORED tables ([[graft.operators.Dedup.probeLshIndex]] — history's
    * text is never re-hashed; the index side of the candidate join is
    * exchange-free off its buckets). Output is identical to q150, checked
    * by the same oracle; DedupSpec pins the skip/rebuild decision itself.
    */
  val q202LshIndexProbe: QueryDef = QueryDef(
    "q202_lsh_index_probe",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Dedup.ensureLshIndex(d.filter(col("doc_id") % 5 =!= 0),
        shingleK = 3, rowsPerBand = 2,
        indexTable = "graft_lsh_index",
        shingleTable = "graft_lsh_shingles")
      Dedup.probeLshIndex(d.filter(col("doc_id") % 5 === 0),
        shingleK = 3, rowsPerBand = 2, threshold = 0.5,
        indexTable = "graft_lsh_index",
        shingleTable = "graft_lsh_shingles")
        .orderBy("new_doc", "old_doc")
    },
    Some(deltaPairsOracle))

  val all: Seq[QueryDef] = Seq(
    q24DedupExact, q25MinhashSignatures, q26MinhashLsh, q27Simhash, q28NgramJaccard,
    q56DedupFingerprint, q57Winnowing, q58DedupClusters, q63SimhashBanded,
    q150DeltaDedup, q201LshIndexBuild, q202LshIndexProbe)
}
