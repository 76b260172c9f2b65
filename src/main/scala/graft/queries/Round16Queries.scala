package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-16 additions: the video modality's PERSISTED-index probe (every
  * other near-dup family already had its incremental path), and the
  * semantic-dedup oracle taken past the 2048-row fixture bound where the
  * operator's DERIVED quantizer k finally exceeds its floor of 4.
  */
object Round16Queries {

  /** VIDEO-FINGERPRINT INDEX PROBE — q346's one-shot banded self-join
    * split into the curation loop's incremental verbs via the generic
    * [[graft.operators.Dedup.ensureSim64Index]] /
    * [[graft.operators.Dedup.probeSim64Index]] lifecycle: history
    * (doc_id % 5 != 0) is fingerprinted ONCE into a catalog table
    * bucketed by (band, key) — build-once; repeats detect the stored row
    * count still matches history's cheap doc count and skip straight to
    * the probe — and the NEW batch (doc_id % 5 == 0) is fingerprinted,
    * banded, and joined against the stored buckets with no history-side
    * exchange and no history-side MP4 synthesis. The oracle replays the
    * closed-form fingerprint chain over BOTH splits and mirrors the
    * history/new banded join, so a stale index, a band split off by one,
    * or a probe that re-reads history's text all land in the hash.
    */
  val q347VideoIndexProbe: QueryDef = QueryDef(
    "q347_video_index_probe",
    (s, dir) => {
      val nHist = Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 5 =!= 0).count() // column-pruned: ids only
      Dedup.ensureSim64Index(
        Round15Queries.videoHashTable(s, dir, col("doc_id") % 5 =!= 0),
        nHist, indexTable = "graft_vid_index")
      Dedup.probeSim64Index(
        Round15Queries.videoHashTable(s, dir, col("doc_id") % 5 === 0),
        maxHamming = 2, indexTable = "graft_vid_index")
        .orderBy("new_doc", "old_doc")
    },
    Some(s"""
      WITH ${Round15Queries.videoBandCtes},
      cand AS (SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS old_doc,
                      a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
               FROM vbx a JOIN vbx b ON a.j = b.j AND a.bv = b.bv
               WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0)
      SELECT new_doc, old_doc,
             CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
               AS INTEGER) AS hamming
      FROM cand
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2
      ORDER BY new_doc, old_doc"""))

  /** The derived-corpus CTE body shared by q348's oracle: 256 base vectors
    * x 16 copies, copy c scaled by 2^c. Power-of-two scaling is EXACT in
    * both float and double (a pure exponent shift), so the Spark side's
    * float arithmetic and DuckDB's double-then-cast produce bit-identical
    * derived vectors — the precondition for replaying Lloyd's tie-breaks.
    */
  private val scaledCorpusSql: String =
    """SELECT u.c * 256 + vec_id AS vec_id,
       list_transform(embedding,
         x -> CAST(x::DOUBLE * power(2.0, u.c) AS FLOAT)) AS embedding
       FROM embeddings,
            unnest([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) AS u(c)
       WHERE vec_id < 256"""

  /** SEMANTIC DEDUP AT DERIVED k > 4 — the scale leg q332 cannot verify
    * (its oracle hard-pins the k=4 Lloyd chain, loud-guarded at n <= 2048):
    * a 4096-vector corpus is DERIVED from the fixture — 256 base
    * embeddings x 16 copies, copy c scaled by the exact factor 2^c — so
    * [[graft.operators.Similarity.semanticDedup]]'s corpus-sized quantizer
    * k = max(4, ceil(4096/512)) = 8 engages for real, and the oracle
    * unrolls the SAME Lloyd chain at k = 8 over the same derived corpus
    * ([[ExtQueries.kmeansCtes]]'s eBody override). Cosine is
    * scale-invariant, so every cross-copy pair of the same base vector is
    * a planted semantic duplicate the dominance rule must drop; the
    * cluster structure, in contrast, is scale-DRIVEN (d2 is not
    * invariant), so a stale centroid, a wrong-side tie, or a k derivation
    * off by one all land in the hash.
    */
  val q348SemanticDedupScaled: QueryDef = QueryDef(
    "q348_semantic_dedup_scaled",
    (s, dir) => {
      val big = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 256)
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(15))).as("c"))
        .select((col("c").cast("long") * 256L + col("vec_id")).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * pow(lit(2.0d), col("c"))).cast("float"))
            .as("embedding"))
      Similarity.semanticDedup(big,
          targetClusterSize = 512, maxDominators = 4096, threshold = 0.35d)
        .orderBy("vec_id")
    },
    Some(s"""
      WITH ${ExtQueries.kmeansCtes(8, 2, 64, scaledCorpusSql)},
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

  val all: Seq[QueryDef] = Seq(q347VideoIndexProbe, q348SemanticDedupScaled)
}
