package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det
import graft.operators.Similarity

/** Round-13 additions: the persisted ANN index lifecycle (the round-12
  * verdict's ask #4 — PQ stage-1 IO off a stored 2-byte codes table, IVF
  * probes off stored centroids, mirroring the LSH index's
  * write/ensure/probe/append verbs) and equality-delete-aware Iceberg scan
  * planning (ask #7).
  */
object Round13Queries {

  /** PERSISTED-ANN-INDEX PQ PROBE — the stored-index twin of q301's
    * inline plan: [[graft.operators.Similarity.ensureAnnIndex]] builds the
    * codes/vectors/centroids tables on the FIRST invocation only (repeats
    * detect the stored vector count still matches and skip straight to
    * the probe, so a bench repeat times the stored-index path), then
    * [[graft.operators.Similarity.probePqIndex]] answers entirely from
    * the store: stage 1 scans the 2-byte `pq_code` column of the codes
    * table against the broadcast query codes (Hamming <= 4), stage 2
    * fetches ONLY the shortlist's vectors from the vec_id-bucketed vector
    * table and re-ranks by exact rounded cosine. The oracle recomputes
    * both stages from `embeddings` alone, so a stale or corrupted stored
    * code lands in the hash.
    */
  val q327AnnIndexPqProbe: QueryDef = QueryDef(
    "q327_ann_index_pq_probe",
    (s, dir) => {
      Similarity.ensureAnnIndex(Tables.load(s, dir, "embeddings"),
        kClusters = 4, iters = 2,
        codesTable = "graft_ann_codes", vecTable = "graft_ann_vecs",
        centroidTable = "graft_ann_cents")
      Similarity.probePqIndex(s, nQueries = 10, k = 10, radius = 4,
        codesTable = "graft_ann_codes", vecTable = "graft_ann_vecs")
        .orderBy("q_id", "rk")
    },
    Some {
      val code = SimilarityQueries.pqCodeSql
      val cos = SimilarityQueries.rdet6(
        SimilarityQueries.cosSql("c.embedding", "q.q_emb"))
      s"""
      WITH coded AS (SELECT vec_id, embedding, ($code) AS pq_code
                     FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, pq_code AS q_code
            FROM coded WHERE vec_id < 10),
      cand AS (SELECT q.q_id, c.vec_id, $cos AS cos
               FROM q, coded c
               WHERE c.vec_id <> q.q_id
                 AND bit_count(xor(c.pq_code, q.q_code)) <= 4)
      SELECT q_id, rk, vec_id, cos FROM (
        SELECT q_id, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
        FROM cand)
      WHERE rk <= 10 ORDER BY q_id, rk"""
    })

  /** PERSISTED-ANN-INDEX IVF PROBE — q79's multiprobe semantics answered
    * from the store: the probe reads the STORED Lloyd centroids (no
    * re-train — [[graft.operators.Similarity.probeIvfIndex]] never calls
    * the fitter), takes each query's two nearest cells, pulls candidates
    * from the cluster-bucketed codes table and re-ranks exactly off the
    * vector table. Same oracle construction as q79 (the unrolled Lloyd
    * CTE chain), so the stored centroids are pinned to the training
    * arithmetic bit-for-bit.
    */
  val q328AnnIndexIvfProbe: QueryDef = QueryDef(
    "q328_ann_index_ivf_probe",
    (s, dir) => {
      Similarity.ensureAnnIndex(Tables.load(s, dir, "embeddings"),
        kClusters = 4, iters = 2,
        codesTable = "graft_ann_codes", vecTable = "graft_ann_vecs",
        centroidTable = "graft_ann_cents")
      Similarity.probeIvfIndex(s, nQueries = 10, k = 5, nprobe = 2,
        codesTable = "graft_ann_codes", vecTable = "graft_ann_vecs",
        centroidTable = "graft_ann_cents")
        .orderBy("q_id", "rk")
    },
    Some(s"""
      WITH ${ExtQueries.kmeansCtes(4, 2, 64)},
      qv AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 10),
      qp AS (SELECT q_id, q_emb, cluster FROM (
              SELECT q.q_id, q.q_emb, c2.cluster,
                     row_number() OVER (PARTITION BY q.q_id
                       ORDER BY ${ExtQueries.d2Sql("q.q_emb", "c2.centroid", 64)}, c2.cluster) AS rkc
              FROM qv q, c2) WHERE rkc <= 2),
      sc AS (SELECT q_id, a.vec_id AS vec_id,
                    ${Det.rdetSql(ExtQueries.d2Sql("a.embedding", "q_emb", 64), 6)} AS d2
             FROM af a JOIN qp USING (cluster) WHERE a.vec_id <> q_id)
      SELECT q_id, rk, vec_id, d2 FROM (
        SELECT q_id, vec_id, d2,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS INTEGER) AS rk
        FROM sc)
      WHERE rk <= 5 ORDER BY q_id, rk"""))

  /** EQUALITY-DELETE SCAN PRUNING — the round-12 verdict's ask #7,
    * exercising [[graft.operators.IcebergManifests.planScanV2]] per row on
    * synthesized-but-real Avro manifest bytes (the q285/q322 protocol):
    * k data files identity-partitioned bucket=0..k-1 under predicate
    * bucket ∈ [0, k-2], one GLOBAL equality delete on the partition-source
    * column whose value domain [a0, a0+span] confines it, one STALE global
    * delete (sequence 9000 < the data's 9001) that must assign to nothing
    * despite covering every bucket, and — on even v — a partition-scoped
    * delete on another column that pins file 0 regardless of domain. The
    * oracle recomputes the full assignment arithmetic closed-form from
    * `documents`, so a planner that ignores scope, sequence, or domain
    * hash-mismatches.
    */
  val q329IcebergEqPrune: QueryDef = QueryDef(
    "q329_iceberg_eq_prune",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.AvroOcf.{TInt, TRecord}
        import graft.operators.IcebergManifests
        import graft.operators.IcebergManifests._
        val partType = TRecord("r102", Vector("bucket" -> TInt))
        val emptyPart = TRecord("r103", Vector())
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          val k = 3 + r.n % 3
          val a0 = (r.v % k).toLong
          val span = (r.n % 2).toLong
          val hasC = r.v % 2 == 0
          val dataEntries = (0 until k).map { i =>
            ManifestEntry(1, Some(9001L),
              DataFile(0, s"data/f$i.parquet", "PARQUET",
                Vector("bucket" -> i.toLong),
                20L + (r.n + 3 * i) % 30,
                500L + (r.v + 5 * i) % 200))
          }
          val dm = IcebergManifests.synthManifest(dataEntries, partType,
            codec, r.v)
          def delEntry(path: String, b: Array[Byte], rc: Long, snap: Long,
              part: Vector[(String, Long)], ids: Vector[Int]) =
            ManifestEntry(1, Some(snap), DataFile(2, path, "AVRO", part,
              rc, b.length.toLong, Some(ids)))
          val aB = IcebergManifests.synthEqDeletes("bucket",
            a0 to (a0 + span), codec, r.v + 1)
          val bB = IcebergManifests.synthEqDeletes("bucket",
            0L until k.toLong, codec, r.v + 2)
          val delA = delEntry("del/a.avro", aB, span + 1, 9002L,
            Vector.empty, Vector(2))
          val delB = delEntry("del/b.avro", bB, k.toLong, 9000L,
            Vector.empty, Vector(2))
          val em1 = IcebergManifests.synthManifest(Seq(delA, delB),
            emptyPart, codec, r.v + 3)
          val cB = IcebergManifests.synthEqDeletes("other", Seq(777L),
            codec, r.v + 4)
          val delC = delEntry("del/c.avro", cB, 1L, 9003L,
            Vector("bucket" -> 0L), Vector(7))
          val em2Opt =
            if (hasC) Some(IcebergManifests.synthManifest(Seq(delC),
              partType, codec, r.v + 5))
            else None
          def mf(path: String, bytes: Array[Byte],
              es: Seq[ManifestEntry], content: Int) =
            ManifestFile(path, bytes.length.toLong, 0, 9001L,
              es.count(_.status == 1), 0, 0,
              es.map(_.dataFile.recordCount).sum, 0L, 0L, None, content)
          val mfs = Seq(mf("meta/dm.avro", dm, dataEntries, 0),
            mf("meta/e1.avro", em1, Seq(delA, delB), 1)) ++
            em2Opt.map(em2 => mf("meta/e2.avro", em2, Seq(delC), 1))
          val list = IcebergManifests.synthManifestList(mfs, codec, r.v + 6)
          val byPath = Map("meta/dm.avro" -> dm, "meta/e1.avro" -> em1,
            "del/a.avro" -> aB, "del/b.avro" -> bB, "del/c.avro" -> cB) ++
            em2Opt.map("meta/e2.avro" -> _)
          val p = IcebergManifests.planScanV2(list, byPath.get,
            field = 0, lo = 0L, hi = (k - 2).toLong, eqFieldId = 2)
            .getOrElse(sys.error(s"planScanV2 declined: doc ${r.doc_id}"))
          (r.doc_id, codec, p.nManifests, p.manifestsPruned,
            p.filesScanned, p.filesMatched, p.rowsMatched,
            p.eqDeleteFiles, p.filesAffected, p.filesDeleteFree,
            p.rowsDeleteFree)
        }
      }
      probed.toDF("doc_id", "codec", "n_manifests", "manifests_pruned",
          "files_scanned", "files_matched", "rows_matched", "eq_files",
          "files_affected", "files_free", "rows_free")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 3 + n % 3 AS k,
                   v % (3 + n % 3) AS a0, n % 2 AS span,
                   v % 2 = 0 AS hasc
            FROM d),
      u AS (SELECT *,
                   list_sum(list_transform(range(k - 1), i ->
                     20 + (n + 3 * i) % 30)) AS rows_matched,
                   list_sum(list_transform(range(k - 1), i ->
                     CASE WHEN (i BETWEEN a0 AND a0 + span)
                            OR (hasc AND i = 0) THEN 1 ELSE 0 END)) AS aff,
                   list_sum(list_transform(range(k - 1), i ->
                     CASE WHEN (i BETWEEN a0 AND a0 + span)
                            OR (hasc AND i = 0) THEN 0
                          ELSE 20 + (n + 3 * i) % 30 END)) AS rows_free
            FROM g)
      SELECT doc_id,
             (['null', 'deflate', 'snappy'])[v % 3 + 1] AS codec,
             CAST(2 + CASE WHEN hasc THEN 1 ELSE 0 END AS INTEGER)
               AS n_manifests,
             CAST(0 AS INTEGER) AS manifests_pruned,
             CAST(k AS INTEGER) AS files_scanned,
             CAST(k - 1 AS INTEGER) AS files_matched,
             CAST(rows_matched AS BIGINT) AS rows_matched,
             CAST(2 + CASE WHEN hasc THEN 1 ELSE 0 END AS INTEGER)
               AS eq_files,
             CAST(aff AS INTEGER) AS files_affected,
             CAST(k - 1 - aff AS INTEGER) AS files_free,
             CAST(COALESCE(rows_free, 0) AS BIGINT) AS rows_free
      FROM u ORDER BY doc_id"""))

  /** LONG-CHAIN CONNECTED COMPONENTS — the scale proof for round 13's
    * [[graft.operators.Graph.connectedComponents]]: each `source` group's
    * documents are chained consecutively (doc ordered by id, one edge per
    * adjacent pair — a PATH graph, the worst diameter shape), so at sf0.1
    * the components have diameter in the hundreds. Min-label propagation
    * (the pre-r13 fixpoint, one hop per round) could not converge inside
    * any reasonable round budget here — its default bound of 20 would
    * throw; the large-star/small-star contraction finishes in ~log₂
    * rounds. Every document labels with its chain's minimum id, which the
    * oracle states in one window expression.
    */
  val q330CcChainRounds: QueryDef = QueryDef(
    "q330_cc_chain",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
      val w = Window.partitionBy("source").orderBy("doc_id")
      val edges = d.withColumn("prev", lag(col("doc_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("doc_id").as("src"), col("prev").as("dst"))
      val (labels, _) = graft.operators.Graph.connectedComponents(edges)
      d.join(labels.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("component"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY source) AS component
      FROM documents ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q327AnnIndexPqProbe, q328AnnIndexIvfProbe,
    q329IcebergEqPrune, q330CcChainRounds)
}
