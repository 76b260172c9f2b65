package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 surface, second tranche: the delta-style CHECKPOINT read
  * path (checkpoint parquet + JSON tail — how a reader actually opens
  * a big table), preference-model fitting, and the remaining
  * LLM-curation scoring family (Kneser–Ney, DSIR importance).
  */
object Round11Queries2 {

  /** DELTA CHECKPOINT + TAIL REPLAY under the oracle gate — the read
    * path real lakehouse readers take (nobody replays a 10M-commit
    * log): each PARTITION's documents become rows of a REAL parquet
    * checkpoint file written by parquet-mr itself
    * ([[graft.operators.ParquetSynth.synthCheckpoint]] — multi-part
    * checkpoints are spec-real, `V.checkpoint.<part>.<of>.parquet`),
    * holding the per-path state fold at version 50: a live add row
    * per path, except every fifth hash which the checkpoint retains
    * as a REMOVE TOMBSTONE (is_add=0, null size — the protocol keeps
    * tombstones so post-checkpoint readers still see the delete).
    * [[graft.operators.ParquetFooter]]/[[graft.operators.ParquetPages]]
    * decode the bytes back (snappy, PLAIN pages, required+optional
    * int64 and UTF-8 binary columns), and
    * [[graft.operators.DeltaReplay.replayFromCheckpoint]] overlays the
    * JSON tail (versions 51+: removes on every third hash, size-3n
    * resurrections on every fourth, commitInfo noise a reader must
    * ignore) with the SAME one-hash-aggregation last-writer-wins fold
    * as the full replay — checkpoint rows are already the fold of
    * everything ≤ V, so union + re-fold is exact. The oracle
    * recomputes the overlap matrix (ckpt-tombstone ∩ tail-remove ∩
    * resurrection) in closed form, so a dropped tombstone, a stale
    * version comparison, or a checkpoint row that lost to an older
    * tail action all land in the hash.
    */
  val q281DeltaCheckpoint: QueryDef = QueryDef(
    "q281_delta_checkpoint",
    (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      // ---- the checkpoint: one real parquet file per partition ----
      val src = d.repartition(col("doc_id")).as[Round5Queries6.MediaSrc]
      val ckpt = src.mapPartitions { rows =>
        import graft.operators.{ParquetFooter, ParquetPages, ParquetSynth}
        import graft.operators.ParquetPages.{PBin, PLong}
        import graft.operators.ParquetSynth.CkptRow
        val docs = rows.toVector
        if (docs.isEmpty) Iterator.empty
        else {
          // state at V=50: every fifth hash was removed before the
          // checkpoint — its state row is the tombstone, not the add
          val state = docs.map { r =>
            if (r.v % 5 == 0)
              CkptRow(s"part-${r.doc_id}", isAdd = false, None, 50L)
            else
              CkptRow(s"part-${r.doc_id}", isAdd = true,
                Some(r.n.toLong), (r.doc_id % 50).toLong)
          }
          val bytes = ParquetSynth.synthCheckpoint(state, snappy = true)
          val f = ParquetFooter.probe(bytes)
            .getOrElse(sys.error("checkpoint footer probe failed"))
          require(f.nRowGroups == 1 && f.numRows == state.length.toLong,
            "checkpoint shape drift")
          def read(name: String) = ParquetPages.readColumn(bytes,
            f.firstGroupChunks.find(_.pathInSchema == name)
              .getOrElse(sys.error(s"no chunk $name")))
            .getOrElse(sys.error(s"checkpoint decode failed: $name"))
          val paths = read("path")
          val isAdds = read("is_add")
          val sizes = read("size")
          val versions = read("version")
          state.indices.iterator.map { i =>
            val path = paths(i) match {
              case Some(b: PBin) => b.str
              case _ => sys.error("missing path")
            }
            val isAdd = isAdds(i) match {
              case Some(PLong(x)) => x == 1L
              case _ => sys.error("missing is_add")
            }
            val size = sizes(i).collect { case PLong(x) => x }
            val version = versions(i) match {
              case Some(PLong(x)) => x
              case _ => sys.error("missing version")
            }
            (path, isAdd, size, version)
          }
        }
      }.toDF("path", "is_add", "size", "version")
        // counted below AND folded into the state — without the cache the
        // per-partition parquet synth+decode would run once per action
        .transform(graft.operators.ScopedCache.cache)
      // ---- the JSON tail: versions 51+ ----
      val removes = d.filter(col("v") % 3 === 0).select(
        (lit(51L) + col("v") % 7).as("version"),
        format_string(
          """{"remove":{"path":"part-%d","deletionTimestamp":%d}}""",
          col("doc_id"), col("n") * 1000L).as("line"))
      val commits = d.select(lit(59L).as("version"),
        lit("""{"commitInfo":{"operation":"WRITE"}}""").as("line"))
      val readds = d.filter(col("v") % 4 === 0).select(
        (lit(60L) + col("v") % 5).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n").cast("long") * 3L).as("line"))
      val tail = removes.unionAll(commits).unionAll(readds)
        // counted AND folded — same two-action shape as ckpt above
        .transform(graft.operators.ScopedCache.cache)
      val nCkptRows = ckpt.count()
      val nTailActions = tail.count()
      val state = graft.operators.DeltaReplay.replayFromCheckpoint(ckpt, tail)
      state.agg(
        count(lit(1)).as("n_paths"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("n_live"),
        sum(when(!col("is_live"), 1L).otherwise(0L)).as("n_tombstones"),
        coalesce(sum(col("size")), lit(0L)).as("live_bytes"),
        max(col("last_version")).as("max_version"))
        .select(lit(nCkptRows).as("n_ckpt_rows"),
          lit(nTailActions).as("n_tail_actions"),
          col("n_paths"), col("n_live"), col("n_tombstones"),
          col("live_bytes"), col("max_version"))
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 4 = 0 THEN 1 ELSE 0 END AS readd,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS trem,
                   CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END AS ctomb
            FROM d)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_ckpt_rows,
             CAST(SUM(1 + trem + readd) AS BIGINT) AS n_tail_actions,
             CAST(COUNT(*) AS BIGINT) AS n_paths,
             CAST(SUM(CASE WHEN readd = 1 OR (trem = 0 AND ctomb = 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
             CAST(SUM(CASE WHEN readd = 1 OR (trem = 0 AND ctomb = 0)
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_tombstones,
             CAST(SUM(CASE WHEN readd = 1 THEN 3 * n
                           WHEN trem = 0 AND ctomb = 0 THEN n
                           ELSE 0 END) AS BIGINT) AS live_bytes,
             CAST(MAX(CASE WHEN readd = 1 THEN 60 + v % 5
                           WHEN trem = 1 THEN 51 + v % 7
                           WHEN ctomb = 1 THEN 50
                           ELSE doc_id % 50 END) AS BIGINT) AS max_version
      FROM g"""))

  /** BRADLEY–TERRY PREFERENCE FIT under the oracle gate — the RLHF
    * reward-modeling primitive: disjoint document pairs (doc_id div 2;
    * the longer text wins, ties to the lower id via a collision-free
    * composite key) become per-source comparison counts, and
    * [[graft.operators.Preference.bradleyTerry]] runs 5 MM iterations
    * (Hunter 2004) in exact scaled-integer arithmetic — ITEM²-bounded
    * state, two broadcast joins + one hash agg per round, the corpus
    * touched exactly once. The oracle replays the identical integer
    * fixpoint as an unrolled 5-round CTE chain in HUGEINT (the q115
    * PageRank protocol), so a single truncation-order difference in
    * any round lands in the hash.
    */
  val q282BradleyTerry: QueryDef = QueryDef(
    "q282_bradley_terry",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          expr("doc_id div 2").as("pid"),
          (col("n_chars") * lit(1000000000000L) - col("doc_id")).as("key"))
      val pr = d.groupBy("pid").agg(
        max_by(col("source"), col("key")).as("winner"),
        min_by(col("source"), col("key")).as("loser"),
        count(lit(1)).as("m"))
      val pw = pr.filter(col("m") === 2 && col("winner") =!= col("loser"))
        .groupBy("winner", "loser").agg(count(lit(1)).cast("long").as("cnt"))
      graft.operators.Preference.bradleyTerry(pw, iters = 5)
        .orderBy("item")
    },
    Some {
      s"""
      WITH d AS (SELECT doc_id, source,
                        doc_id // 2 AS pid,
                        n_chars * 1000000000000 - doc_id AS key
                 FROM documents),
      pr AS (SELECT pid,
                    max_by(source, key) AS winner,
                    min_by(source, key) AS loser,
                    count(*) AS m
             FROM d GROUP BY pid),
      pw AS (SELECT winner, loser, CAST(count(*) AS BIGINT) AS cnt
             FROM pr WHERE m = 2 AND winner <> loser GROUP BY 1, 2),
      sym AS (SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n FROM (
                SELECT winner AS a, loser AS b, cnt FROM pw
                UNION ALL SELECT loser AS a, winner AS b, cnt FROM pw) u
              GROUP BY 1, 2),
      wins AS (SELECT winner AS item, CAST(SUM(cnt) AS BIGINT) AS w
               FROM pw GROUP BY 1),
      ${btChainSql(5)}"""
    })

  /** KNESER–NEY SMOOTHED LM SCORING under the oracle gate — the
    * smoothing the CCNet/KenLM quality-filter stack actually uses
    * (interpolated KN, Kneser & Ney 1995): beside q160's add-one
    * baseline, each bigram scores
    *
    *   P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1,·)/c1) · N1+(·,w2)/B
    *
    * with discount D = 0.75 (c12 ≥ 1 on a train-equals-score corpus,
    * so the max(·,0) clamp is vacuous — documented, not skipped) —
    * the continuation probability N1+(·,w2)/B is what distinguishes
    * KN from every count-ratio smoother. Distributed shape mirrors
    * q160: the bigram/prefix/continuation tables are
    * VOCABULARY²-bounded broadcast state, the only corpus-sized work
    * is one (doc, bigram) hash aggregate, and the per-doc fold runs
    * in bigram-sorted order so both engines execute the identical
    * IEEE sequence (the order-pinned-fold protocol; rdet6 display).
    */
  val q283KneserNey: QueryDef = QueryDef(
    "q283_kneser_ney",
    (s, dir) => {
      import graft.functions.Det
      val docs = Tables.load(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 2)
      val db = docs
        .select(col("doc_id"),
          explode(graft.plans.WordGrams(col("text"), 2, ' ')).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .transform(graft.operators.ScopedCache.cache)
      val bgc = db.groupBy("bg").agg(sum(col("c")).as("cb"))
        .withColumn("prev", element_at(split(col("bg"), " "), 1))
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
        .transform(graft.operators.ScopedCache.cache)
      val prevc = bgc.groupBy("prev").agg(sum(col("cb")).as("cp"),
        count(lit(1)).as("np"))
      val contc = bgc.groupBy("w2").agg(count(lit(1)).as("nc"))
      val btypes = bgc.agg(count(lit(1)).as("bt"))
      db.join(broadcast(bgc.select("bg", "cb", "prev", "w2")), "bg")
        .join(broadcast(prevc), "prev")
        .join(broadcast(contc), "w2")
        .crossJoin(broadcast(btypes))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_bigrams"),
          array_sort(collect_list(
            struct(col("bg"), col("c"), col("cb"), col("cp"), col("np"),
              col("nc"), col("bt")))).as("terms"))
        .select(col("doc_id"), col("n_bigrams"),
          Det.rdet(
            aggregate(col("terms"), lit(0.0d),
              (acc, x) => acc + x("c") * log2(
                (x("cb").cast("double") - 0.75d) / x("cp").cast("double") +
                  (lit(0.75d) * x("np").cast("double")) / x("cp").cast("double") *
                    (x("nc").cast("double") / x("bt").cast("double")))) /
              col("n_bigrams"), 6).as("kn_avg_logprob"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      db AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg,
                    CAST(count(*) AS BIGINT) AS c
             FROM d, unnest(range(1, len(ws))) AS u(i) GROUP BY 1, 2),
      bgc AS (SELECT bg, SUM(c) AS cb, str_split(bg, ' ')[1] AS prev,
                     str_split(bg, ' ')[2] AS w2
              FROM db GROUP BY 1),
      prevc AS (SELECT prev, SUM(cb) AS cp, CAST(count(*) AS BIGINT) AS np
                FROM bgc GROUP BY 1),
      contc AS (SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM bgc GROUP BY 1),
      bt AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bgc),
      terms AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                       list([bg, CAST(c AS VARCHAR), CAST(bgc.cb AS VARCHAR),
                             CAST(prevc.cp AS VARCHAR), CAST(prevc.np AS VARCHAR),
                             CAST(contc.nc AS VARCHAR), CAST(bt.bt AS VARCHAR)]
                            ORDER BY bg) AS ts
                FROM db JOIN bgc USING (bg)
                        JOIN prevc ON prevc.prev = bgc.prev
                        JOIN contc ON contc.w2 = bgc.w2
                        CROSS JOIN bt
                GROUP BY doc_id)
      SELECT doc_id, n_bigrams,
             floor((list_reduce(
                      list_prepend(CAST(0 AS DOUBLE),
                        list_transform(ts, x ->
                          CAST(x[2] AS DOUBLE) * log2(
                            (CAST(x[3] AS DOUBLE) - 0.75e0) / CAST(x[4] AS DOUBLE) +
                              (0.75e0 * CAST(x[5] AS DOUBLE)) / CAST(x[4] AS DOUBLE) *
                                (CAST(x[6] AS DOUBLE) / CAST(x[7] AS DOUBLE))))),
                      (acc, v) -> acc + v) / n_bigrams) * 1e6 + 0.5) / 1e6
               AS kn_avg_logprob
      FROM terms ORDER BY doc_id"""))

  /** DSIR-STYLE IMPORTANCE WEIGHTS under the oracle gate — data
    * selection via hashed-n-gram importance resampling (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * 2023): unigram features hash into 64 buckets, the TARGET
    * distribution is the English slice, the RAW distribution the
    * whole corpus, both add-one smoothed, and each document scores
    * the average log-likelihood ratio of its word occurrences —
    * positive means "looks like target". The 64-bucket ratio table is
    * broadcast state; the only corpus-sized work is one explode →
    * (doc, bucket) hash aggregate; the per-doc fold runs in
    * bucket-sorted order (the order-pinned-fold protocol) and the
    * selected flag compares the ROUNDED score so the threshold is
    * engine-identical.
    */
  val q284DsirImportance: QueryDef = QueryDef(
    "q284_dsir_importance",
    (s, dir) => {
      import graft.functions.Det
      import graft.functions.HashFunctions
      val words = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(col("doc_id"), col("lang"),
          pmod(HashFunctions.hash32(col("w")), lit(64)).as("b"))
        .transform(graft.operators.ScopedCache.cache)
      val dbkt = words.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      val raw = words.groupBy("b").agg(count(lit(1)).as("rb"))
      val tgt = words.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("tb"))
      val totals = words.agg(
        count(lit(1)).as("rt"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
      val ratios = raw.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("b"), col("rb"), coalesce(col("tb"), lit(0L)).as("tb"),
          col("rt"), col("tt"))
      dbkt.join(broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_words"),
          array_sort(collect_list(
            struct(col("b"), col("c"), col("tb"), col("tt"), col("rb"),
              col("rt")))).as("terms"))
        .select(col("doc_id"), col("n_words"),
          Det.rdet(
            aggregate(col("terms"), lit(0.0d),
              (acc, x) => acc + x("c") * (
                log2((x("tb").cast("double") + 1.0d) /
                  (x("tt").cast("double") + 64.0d)) -
                  log2((x("rb").cast("double") + 1.0d) /
                    (x("rt").cast("double") + 64.0d)))) /
              col("n_words"), 6).as("avg_llr"))
        .withColumn("selected",
          when(col("avg_llr") > 0.0d, 1).otherwise(0))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (SELECT doc_id, lang,
                        CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % 64
                          AS BIGINT) AS b
                 FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                       FROM documents)
                 WHERE word != ''),
      dbkt AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
               FROM w GROUP BY 1, 2),
      raw AS (SELECT b, CAST(count(*) AS BIGINT) AS rb FROM w GROUP BY 1),
      tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS tb FROM w
              WHERE lang = 'en' GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS rt,
                     CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS tt
              FROM w),
      ratios AS (SELECT raw.b, raw.rb, coalesce(tgt.tb, 0) AS tb, tot.rt, tot.tt
                 FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot),
      terms AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                       list([CAST(dbkt.b AS VARCHAR), CAST(c AS VARCHAR),
                             CAST(tb AS VARCHAR), CAST(tt AS VARCHAR),
                             CAST(rb AS VARCHAR), CAST(rt AS VARCHAR)]
                            ORDER BY dbkt.b) AS ts
                FROM dbkt JOIN ratios ON ratios.b = dbkt.b
                GROUP BY doc_id)
      SELECT doc_id, n_words,
             floor((list_reduce(
                      list_prepend(CAST(0 AS DOUBLE),
                        list_transform(ts, x ->
                          CAST(x[2] AS DOUBLE) * (
                            log2((CAST(x[3] AS DOUBLE) + 1) /
                                 (CAST(x[4] AS DOUBLE) + 64)) -
                            log2((CAST(x[5] AS DOUBLE) + 1) /
                                 (CAST(x[6] AS DOUBLE) + 64))))),
                      (acc, v) -> acc + v) / n_words) * 1e6 + 0.5) / 1e6
               AS avg_llr,
             CASE WHEN floor((list_reduce(
                      list_prepend(CAST(0 AS DOUBLE),
                        list_transform(ts, x ->
                          CAST(x[2] AS DOUBLE) * (
                            log2((CAST(x[3] AS DOUBLE) + 1) /
                                 (CAST(x[4] AS DOUBLE) + 64)) -
                            log2((CAST(x[5] AS DOUBLE) + 1) /
                                 (CAST(x[6] AS DOUBLE) + 64))))),
                      (acc, v) -> acc + v) / n_words) * 1e6 + 0.5) / 1e6 > 0
                  THEN 1 ELSE 0 END AS selected
      FROM terms ORDER BY doc_id"""))

  /** ICEBERG SCAN PLANNING under the oracle gate — the pruning the
    * metadata tree exists for: per document, a three-manifest snapshot
    * is synthesized whose manifests occupy distinct bucket ranges
    * (manifest m holds buckets 4m..4m+3) with TRUTHFUL manifest-list
    * `field_summary` bounds, and
    * [[graft.operators.IcebergManifests.planScan]] plans a
    * `bucket ∈ [lo, hi]` scan: manifests whose bounds exclude the
    * range are skipped WITHOUT BEING RESOLVED — a counting resolver
    * enforces `resolve calls = manifests − pruned` per document, so a
    * planner that "pruned" but peeked (or opened what it claimed to
    * skip) fails loudly. Opened manifests pass the replay arithmetic
    * plus the summary-truthfulness check. The oracle recomputes every
    * bound, prune decision, and surviving file/row/byte count in
    * closed form.
    */
  val q285IcebergPruning: QueryDef = QueryDef(
    "q285_iceberg_pruning",
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
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          // manifest m holds buckets 4m..4m+3; summaries are truthful
          val manifests = (0 until 3).map { m =>
            val k = 2 + (r.n + m) % 3
            val entries = (0 until k).map { i =>
              ManifestEntry(if (i == 0) 0 else 1,
                if (i == 0) None else Some(9000L + m),
                DataFile(0, s"data/m$m/f$i.parquet", "PARQUET",
                  Vector("bucket" -> (4L * m + (r.v + i) % 4)),
                  100L + (r.n + 7 * i + m) % 50,
                  1000L + (r.v * 3 + i * 11 + m * 17) % 500))
            }
            val bytes = IcebergManifests.synthManifest(entries, partType,
              codec, r.v + m)
            val buckets = entries.map(_.dataFile.partition.head._2)
            val mf = ManifestFile(s"meta/m$m.avro", bytes.length.toLong, 0,
              9000L + m,
              addedFiles = entries.count(_.status == 1),
              existingFiles = entries.count(_.status == 0),
              deletedFiles = 0,
              addedRows = entries.filter(_.status == 1)
                .map(_.dataFile.recordCount).sum,
              existingRows = entries.filter(_.status == 0)
                .map(_.dataFile.recordCount).sum,
              deletedRows = 0L,
              partitions = Some(Vector(FieldSummary(containsNull = false,
                Some(buckets.min.toString), Some(buckets.max.toString)))))
            (mf, bytes)
          }
          val list = IcebergManifests.synthManifestList(manifests.map(_._1),
            codec, r.v + 7)
          val byPath = manifests.map(m => m._1.path -> m._2).toMap
          var resolves = 0
          val resolve = (p: String) => { resolves += 1; byPath.get(p) }
          val lo = (r.v % 10).toLong
          val hi = lo + 2L
          val plan = IcebergManifests.planScan(list, resolve, 0, lo, hi)
            .getOrElse(sys.error(s"scan planning failed: doc ${r.doc_id}"))
          require(resolves == plan.nManifests - plan.manifestsPruned,
            s"planner resolved a pruned manifest: doc ${r.doc_id}")
          (r.doc_id, plan.nManifests, plan.manifestsPruned,
            plan.filesScanned, plan.filesMatched, plan.rowsMatched,
            plan.bytesMatched)
        }
      }
      probed.toDF("doc_id", "n_manifests", "n_pruned", "files_scanned",
          "files_matched", "rows_matched", "bytes_matched")
        .select(col("doc_id"), col("n_manifests").cast("int"),
          col("n_pruned").cast("int"), col("files_scanned").cast("int"),
          col("files_matched").cast("int"), col("rows_matched"),
          col("bytes_matched"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS BIGINT) AS v
                 FROM documents),
      m AS (SELECT doc_id, n, v, v % 10 AS lo, v % 10 + 2 AS hi, u.m
            FROM d, unnest(range(3)) AS u(m)),
      e AS (SELECT *,
                   2 + (n + m) % 3 AS k,
                   list_transform(range(2 + (n + m) % 3),
                     i -> 4 * m + (v + i) % 4) AS buckets
            FROM m),
      p AS (SELECT *,
                   CASE WHEN hi < list_min(buckets) OR lo > list_max(buckets)
                        THEN 1 ELSE 0 END AS pruned
            FROM e),
      agg AS (SELECT doc_id,
                     CAST(count(*) AS INTEGER) AS n_manifests,
                     CAST(SUM(pruned) AS INTEGER) AS n_pruned,
                     CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE k END)
                       AS INTEGER) AS files_scanned,
                     CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE
                       list_sum(list_transform(range(k), i ->
                         CASE WHEN 4 * m + (v + i) % 4 BETWEEN lo AND hi
                              THEN 1 ELSE 0 END)) END) AS INTEGER)
                       AS files_matched,
                     CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE
                       list_sum(list_transform(range(k), i ->
                         CASE WHEN 4 * m + (v + i) % 4 BETWEEN lo AND hi
                              THEN 100 + (n + 7 * i + m) % 50
                              ELSE 0 END)) END) AS BIGINT) AS rows_matched,
                     CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE
                       list_sum(list_transform(range(k), i ->
                         CASE WHEN 4 * m + (v + i) % 4 BETWEEN lo AND hi
                              THEN 1000 + (v * 3 + i * 11 + m * 17) % 500
                              ELSE 0 END)) END) AS BIGINT) AS bytes_matched
              FROM p GROUP BY doc_id)
      SELECT * FROM agg ORDER BY doc_id"""))

  /** DELTA CDC BETWEEN VERSIONS under the oracle gate — the
    * incremental-processing question ("what changed between v49 and
    * v70?") answered by [[graft.operators.DeltaReplay.diff]] in ONE
    * hash aggregation (two conditional `max_by` endpoint states per
    * path over one shuffle — never two replays, never a self-join).
    * The synthesized log exercises five of the seven change classes:
    * late adds (absent at the low version), tail removes, resurrections
    * at size 2n+7 (`resized`; ADDITIVE so a zero-byte document still
    * registers a size change instead of degrading to `unchanged` —
    * 2·0 = 0 would collide with the original), remove-then-nothing
    * (`removed`), and
    * late adds that die again (`transient`). The oracle recomputes the
    * class of every path and the per-class byte totals in closed form,
    * so a misordered tie-break or an endpoint that leaked past its
    * version bound lands in the hash.
    */
  val q286DeltaCdc: QueryDef = QueryDef(
    "q286_delta_cdc",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      val adds = d.select(
        when(col("v") % 7 === 0, lit(55L))
          .otherwise(col("doc_id") % 50).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n")).as("line"))
      val removes = d.filter(col("v") % 3 === 0).select(
        (lit(58L) + col("v") % 5).as("version"),
        format_string(
          """{"remove":{"path":"part-%d","deletionTimestamp":%d}}""",
          col("doc_id"), col("n") * 1000L).as("line"))
      val readds = d.filter(col("v") % 9 === 0).select(
        (lit(65L) + col("v") % 5).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n") * 2L + 7L).as("line"))
      val log = adds.unionAll(removes).unionAll(readds)
      graft.operators.DeltaReplay.diff(log, vLow = 49L, vHigh = 70L)
        .groupBy("change")
        .agg(count(lit(1)).as("n_paths"),
          coalesce(sum(col("lo_size")), lit(0L)).as("lo_bytes"),
          coalesce(sum(col("hi_size")), lit(0L)).as("hi_bytes"))
        .orderBy("change")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n,
                   CASE WHEN v % 7 = 0 THEN 1 ELSE 0 END AS la,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS rem,
                   CASE WHEN v % 9 = 0 THEN 1 ELSE 0 END AS rd
            FROM d),
      c AS (SELECT doc_id, n,
                   CASE WHEN la = 1 AND (rd = 1 OR rem = 0) THEN 'added'
                        WHEN la = 1 THEN 'transient'
                        WHEN rd = 1 THEN 'resized'
                        WHEN rem = 1 THEN 'removed'
                        ELSE 'unchanged' END AS change,
                   CASE WHEN la = 1 THEN NULL ELSE n END AS lo_size,
                   CASE WHEN rd = 1 THEN 2 * n + 7
                        WHEN rem = 1 THEN NULL
                        ELSE n END AS hi_size
            FROM g)
      SELECT change,
             CAST(count(*) AS BIGINT) AS n_paths,
             CAST(coalesce(SUM(lo_size), 0) AS BIGINT) AS lo_bytes,
             CAST(coalesce(SUM(hi_size), 0) AS BIGINT) AS hi_bytes
      FROM c GROUP BY change ORDER BY change"""))

  /** ICEBERG INCREMENTAL SNAPSHOT DIFF under the oracle gate — the
    * changelog-scan primitive: two snapshots of the same table (B
    * keeps manifest a0 byte-identical, rewrites a1 with its first file
    * flipped to DELETED, and appends a fresh manifest b2), both
    * replayed through the arithmetic-enforcing
    * [[graft.operators.IcebergManifests.replay]], and the live-set
    * diff — files appended since A, files removed since A — reported
    * with row and byte sums. The oracle recomputes both live sets and
    * the diff in closed form, so a status misread in EITHER snapshot
    * or a diff that confused path identity lands in the hash.
    */
  val q287IcebergIncremental: QueryDef = QueryDef(
    "q287_iceberg_incremental",
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
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          def df(tag: String, i: Int, rc: Long, fs: Long) =
            DataFile(0, s"data/$tag/f$i.parquet", "PARQUET",
              Vector("bucket" -> (i % 4).toLong), rc, fs)
          def mf(path: String, bytes: Array[Byte],
              es: Seq[ManifestEntry]) = {
            def c(st: Int) = (es.count(_.status == st),
              es.filter(_.status == st).map(_.dataFile.recordCount).sum)
            val (af, ar) = c(1); val (ef, er) = c(0); val (dn, dr) = c(2)
            ManifestFile(path, bytes.length.toLong, 0, 9001L,
              af, ef, dn, ar, er, dr, None)
          }
          // snapshot A: a0 + a1, all live
          val a0e = (0 until 2 + r.n % 3).map(i =>
            ManifestEntry(if (i == 0) 0 else 1,
              if (i == 0) None else Some(9001L),
              df("a0", i, 100L + (r.n + i) % 40, 500L + (r.v + 3 * i) % 100)))
          val a1e = (0 until 2 + r.v % 3).map(i =>
            ManifestEntry(1, Some(9001L),
              df("a1", i, 80L + (r.v + 2 * i) % 30, 400L + (r.n + 5 * i) % 90)))
          val a0 = IcebergManifests.synthManifest(a0e, partType, codec, r.v)
          val a1 = IcebergManifests.synthManifest(a1e, partType, codec, r.v + 1)
          val listA = IcebergManifests.synthManifestList(
            Seq(mf("meta/a0.avro", a0, a0e), mf("meta/a1.avro", a1, a1e)),
            codec, r.v + 2)
          // snapshot B: a0 kept byte-identical; a1's f0 flips DELETED;
          // fresh b2 appended
          val b1e = a1e.zipWithIndex.map { case (e, i) =>
            if (i == 0) e.copy(status = 2) else e.copy(status = 0)
          }
          val b2e = (0 until 1 + (r.n + r.v) % 3).map(i =>
            ManifestEntry(1, Some(9002L),
              df("b2", i, 60L + (r.n + 3 * i) % 25, 300L + (r.v + 7 * i) % 80)))
          val b1 = IcebergManifests.synthManifest(b1e, partType, codec, r.v + 3)
          val b2 = IcebergManifests.synthManifest(b2e, partType, codec, r.v + 4)
          val listB = IcebergManifests.synthManifestList(
            Seq(mf("meta/a0.avro", a0, a0e), mf("meta/b1.avro", b1, b1e),
              mf("meta/b2.avro", b2, b2e)), codec, r.v + 5)
          val byPath = Map("meta/a0.avro" -> a0, "meta/a1.avro" -> a1,
            "meta/b1.avro" -> b1, "meta/b2.avro" -> b2)
          val stA = IcebergManifests.replay(listA, byPath.get)
            .getOrElse(sys.error(s"snapshot A replay failed: doc ${r.doc_id}"))
          val stB = IcebergManifests.replay(listB, byPath.get)
            .getOrElse(sys.error(s"snapshot B replay failed: doc ${r.doc_id}"))
          val liveA = stA.live.map(f => f.path -> f).toMap
          val liveB = stB.live.map(f => f.path -> f).toMap
          val appended = stB.live.filterNot(f => liveA.contains(f.path))
          val removed = stA.live.filterNot(f => liveB.contains(f.path))
          (r.doc_id, stA.live.size, stB.live.size,
            appended.size, appended.map(_.recordCount).sum,
            appended.map(_.fileSizeBytes).sum,
            removed.size, removed.map(_.recordCount).sum,
            removed.map(_.fileSizeBytes).sum)
        }
      }
      probed.toDF("doc_id", "n_live_a", "n_live_b", "n_appended",
          "appended_rows", "appended_bytes", "n_removed", "removed_rows",
          "removed_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + n % 3 AS k0,
                   2 + v % 3 AS k1,
                   1 + (n + v) % 3 AS k2
            FROM d)
      SELECT doc_id,
             CAST(k0 + k1 AS INTEGER) AS n_live_a,
             CAST(k0 + k1 - 1 + k2 AS INTEGER) AS n_live_b,
             CAST(k2 AS INTEGER) AS n_appended,
             CAST(list_sum(list_transform(range(k2), i ->
               60 + (n + 3 * i) % 25)) AS BIGINT) AS appended_rows,
             CAST(list_sum(list_transform(range(k2), i ->
               300 + (v + 7 * i) % 80)) AS BIGINT) AS appended_bytes,
             CAST(1 AS INTEGER) AS n_removed,
             CAST(80 + v % 30 AS BIGINT) AS removed_rows,
             CAST(400 + n % 90 AS BIGINT) AS removed_bytes
      FROM g ORDER BY doc_id"""))

  /** CHECKPOINT-SEEDED STREAMING STATE under the oracle gate — the
    * q263 protocol applied to the checkpoint read path: the EXACT
    * `mapGroupsWithState` function the continuous
    * [[graft.operators.DeltaReplay.replayStreamFromCheckpoint]] twin
    * executes (checkpoint rows seed the per-path INITIAL STATE —
    * tombstones included — and tail actions fold in under the
    * newer-than-held guard) runs here in BATCH mode over q281's
    * checkpoint/tail synthesis, and its aggregated table state must
    * hash-match the same closed-form oracle. A seed the tail never
    * touches must still surface; a stale tail action must lose to the
    * seeded version.
    */
  val q288DeltaCheckpointStream: QueryDef = QueryDef(
    "q288_delta_checkpoint_stream",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      // the q281 checkpoint state at V=50, as a frame (q281 proves the
      // parquet wire path; this query puts the SEEDED state transition
      // on the gate)
      val ckpt = d.select(
        format_string("part-%d", col("doc_id")).as("path"),
        (col("v") % 5 =!= 0).as("is_add"),
        when(col("v") % 5 =!= 0, col("n")).as("size"),
        when(col("v") % 5 === 0, lit(50L))
          .otherwise(col("doc_id") % 50).as("version"))
      val removes = d.filter(col("v") % 3 === 0).select(
        (lit(51L) + col("v") % 7).as("version"),
        format_string(
          """{"remove":{"path":"part-%d","deletionTimestamp":%d}}""",
          col("doc_id"), col("n") * 1000L).as("line"))
      val readds = d.filter(col("v") % 4 === 0).select(
        (lit(60L) + col("v") % 5).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n") * 3L).as("line"))
      val tail = removes.unionAll(readds)
      graft.operators.DeltaReplay.replayStreamFromCheckpoint(ckpt, tail)
        .agg(
          count(lit(1)).as("n_paths"),
          sum(when(col("is_live"), 1L).otherwise(0L)).as("n_live"),
          sum(when(!col("is_live"), 1L).otherwise(0L)).as("n_tombstones"),
          coalesce(sum(col("size")), lit(0L)).as("live_bytes"),
          max(col("last_version")).as("max_version"))
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   CASE WHEN v % 4 = 0 THEN 1 ELSE 0 END AS readd,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS trem,
                   CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END AS ctomb
            FROM d)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
             CAST(SUM(CASE WHEN readd = 1 OR (trem = 0 AND ctomb = 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
             CAST(SUM(CASE WHEN readd = 1 OR (trem = 0 AND ctomb = 0)
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_tombstones,
             CAST(SUM(CASE WHEN readd = 1 THEN 3 * n
                           WHEN trem = 0 AND ctomb = 0 THEN n
                           ELSE 0 END) AS BIGINT) AS live_bytes,
             CAST(MAX(CASE WHEN readd = 1 THEN 60 + v % 5
                           WHEN trem = 1 THEN 51 + v % 7
                           WHEN ctomb = 1 THEN 50
                           ELSE doc_id % 50 END) AS BIGINT) AS max_version
      FROM g"""))

  /** EXIF GPS PII under the oracle gate — the image-side counterpart of
    * q113's text redaction: camera photos leak location through the
    * EXIF GPS IFD, so per document a REAL baseline JPEG
    * ([[graft.operators.JpegCodec.encodeJpegFlat]]) is tagged with a
    * spec-layout APP1 EXIF segment (both byte orders rotating; IFD0
    * Make/Model/DateTime + GPS pointer; RATIONAL deg/min/sec triplets),
    * probed back by [[graft.operators.Exif.probeJpeg]], and then
    * STRIPPED ([[graft.operators.Exif.stripExif]] — the
    * `exiftool -all=` privacy operation). Enforced in-query: the strip
    * removes the segment byte-exactly, the re-probe shows no GPS, and
    * the stripped image still DECODES to the identical pixels (a strip
    * that corrupts the scan fails loudly). The oracle recomputes every
    * probed field and the removed-byte arithmetic (the deterministic
    * IFD/value-area layout) in closed form.
    */
  val q289ExifGpsStrip: QueryDef = QueryDef(
    "q289_exif_gps_strip",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.{Exif, JpegCodec}
        val le = r.v % 2 == 0
        val make = "maker" + ('a' + r.v % 26).toChar
        val model = ('a' + r.n % 26).toChar.toString * (4 + r.v % 3)
        val dt = s"2023:0${1 + r.v % 9}:1${r.n % 10}" +
          s" 0${r.v % 6}:${10 + r.v % 50}:${10 + r.n % 50}"
        val latRef = if (r.v % 2 == 0) "N" else "S"
        val lonRef = if (r.n % 2 == 0) "E" else "W"
        val lat = Vector((r.v % 90).toLong, (r.n % 60).toLong,
          ((r.v + r.n) % 60).toLong)
        val lon = Vector((r.n % 180).toLong, (r.v % 60).toLong,
          (r.v * 3 % 60).toLong)
        val base = JpegCodec.encodeJpegFlat(16 + r.n % 16, 16 + r.v % 8,
          subsample420 = r.v % 2 == 1,
          (bx, by) => (r.v + bx * 7 + by * 13) % 256)
        val jpeg = Exif.insertApp1(base,
          Exif.synthApp1(le, make, model, dt, latRef, lat, lonRef, lon))
        val info = Exif.probeJpeg(jpeg)
          .getOrElse(sys.error(s"exif probe failed: doc ${r.doc_id}"))
        val g = info.gps.getOrElse(sys.error(s"gps missing: doc ${r.doc_id}"))
        require((g.lat ++ g.lon).forall(_._2 == 1L),
          s"rational denominator drift: doc ${r.doc_id}")
        val stripped = Exif.stripExif(jpeg)
          .getOrElse(sys.error(s"strip failed: doc ${r.doc_id}"))
        val after = Exif.probeJpeg(stripped)
          .getOrElse(sys.error(s"stripped re-probe failed: doc ${r.doc_id}"))
        require(after.gps.isEmpty && after.make.isEmpty,
          s"strip left EXIF behind: doc ${r.doc_id}")
        val px0 = JpegCodec.decodeJpeg(jpeg)
          .getOrElse(sys.error(s"tagged decode failed: doc ${r.doc_id}"))
        val px1 = JpegCodec.decodeJpeg(stripped)
          .getOrElse(sys.error(s"stripped decode failed: doc ${r.doc_id}"))
        require(px0.pixels.toSeq == px1.pixels.toSeq,
          s"strip perturbed pixels: doc ${r.doc_id}")
        (r.doc_id, if (info.littleEndian) 1 else 0,
          info.make.orNull, info.model.orNull, info.dateTime.orNull,
          g.latRef, g.lat(0)._1, g.lat(1)._1, g.lat(2)._1,
          g.lonRef, g.lon(0)._1, g.lon(1)._1, g.lon(2)._1,
          (jpeg.length - stripped.length).toLong)
      }
      probed.toDF("doc_id", "little_endian", "make", "model", "date_time",
          "lat_ref", "lat_deg", "lat_min", "lat_sec",
          "lon_ref", "lon_deg", "lon_min", "lon_sec", "removed_bytes")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS BIGINT) AS v
                 FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS INTEGER)
               AS little_endian,
             'maker' || chr(CAST(97 + v % 26 AS INTEGER)) AS make,
             repeat(chr(CAST(97 + n % 26 AS INTEGER)), CAST(4 + v % 3 AS INTEGER))
               AS model,
             '2023:0' || (1 + v % 9) || ':1' || (n % 10) ||
               ' 0' || (v % 6) || ':' || (10 + v % 50) || ':' || (10 + n % 50)
               AS date_time,
             CASE WHEN v % 2 = 0 THEN 'N' ELSE 'S' END AS lat_ref,
             CAST(v % 90 AS BIGINT) AS lat_deg,
             CAST(n % 60 AS BIGINT) AS lat_min,
             CAST((v + n) % 60 AS BIGINT) AS lat_sec,
             CASE WHEN n % 2 = 0 THEN 'E' ELSE 'W' END AS lon_ref,
             CAST(n % 180 AS BIGINT) AS lon_deg,
             CAST(v % 60 AS BIGINT) AS lon_min,
             CAST(v * 3 % 60 AS BIGINT) AS lon_sec,
             -- 4 marker+len, 6 Exif id, 8 tiff header, 54+54 IFDs,
             -- 48 rationals, make 6+1, model (4+v%3)+1, datetime 19+1
             CAST(4 + 6 + 8 + 54 + 54 + 48 + 7 + (5 + v % 3) + 20 AS BIGINT)
               AS removed_bytes
      FROM d ORDER BY doc_id"""))

  /** RANKING-AWARE RETRIEVAL EVAL under the oracle gate — nDCG@5 and
    * MRR of the label-probed IVF search against brute-force ground
    * truth, completing q157's set-recall gauge with the metrics that
    * see ORDER: ground-truth relevance grades are 6 − brute_rank
    * (rank 1 ⇒ grade 5), DCG folds grade/log2(rank+1) in rank order
    * (the order-pinned-fold protocol), the ideal DCG is derived by the
    * SAME fold over ranks 1..5 in both engines, and MRR is the
    * reciprocal of the first relevant probed rank (an exact MIN + one
    * shared IEEE division). Both searches are the existing operators —
    * queries broadcast, the corpus never shuffles; the eval is a join
    * over 2·(nQueries·k) rows.
    */
  val q290RetrievalNdcg: QueryDef = QueryDef(
    "q290_retrieval_ndcg",
    (s, dir) => {
      import graft.functions.Det
      import graft.operators.Similarity
      val e = Tables.load(s, dir, "embeddings")
      val brute = Similarity.topKBrute(e, nQueries = 10, k = 5)
        .select(col("q_id"), col("vec_id"),
          (lit(6) - col("rk")).cast("double").as("rel"))
      val probed = Similarity.topKByLabel(e, nQueries = 10, k = 5)
        .select(col("q_id"), col("vec_id"), col("rk"))
      val idcg = aggregate(sequence(lit(1), lit(5)), lit(0.0d),
        (acc, i) => acc + (lit(6.0d) - i.cast("double")) /
          log2(i.cast("double") + 1.0d))
      probed.join(brute, Seq("q_id", "vec_id"), "left")
        .select(col("q_id"), col("rk"),
          coalesce(col("rel"), lit(0.0d)).as("rel"))
        .groupBy("q_id")
        .agg(
          array_sort(collect_list(struct(col("rk"), col("rel")))).as("terms"),
          min(when(col("rel") > 0.0d, col("rk"))).as("frk"))
        .select(col("q_id"),
          Det.rdetLong(
            aggregate(col("terms"), lit(0.0d),
              (acc, x) => acc + x("rel") /
                log2(x("rk").cast("double") + 1.0d)) / idcg, 6)
            .as("ndcg_e6"),
          Det.rdetLong(
            when(col("frk").isNull, lit(0.0d))
              .otherwise(lit(1.0d) / col("frk").cast("double")), 6)
            .as("mrr_e6"))
        .orderBy("q_id")
    },
    Some {
      val dot = (a: String, b: String) =>
        s"""list_reduce(list_transform(generate_series(1, 64),
           |  i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin.replace("\n", " ")
      val cos = (a: String, b: String) =>
        s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
      def rdet6(e: String) = s"floor(($e) * 1e6 + 0.5) / 1e6"
      s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
                 FROM embeddings WHERE vec_id < 10),
      bsc AS (SELECT q_id, vec_id, ${rdet6(cos("embedding", "q_emb"))} AS cos
              FROM embeddings, q WHERE vec_id <> q_id),
      brute AS (SELECT q_id, vec_id, CAST(6 - rk AS DOUBLE) AS rel FROM (
                  SELECT q_id, vec_id,
                         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
                  FROM bsc) WHERE rk <= 5),
      lsc AS (SELECT q_id, vec_id, ${rdet6(cos("embedding", "q_emb"))} AS cos
              FROM embeddings, q WHERE label = q_label AND vec_id <> q_id),
      probed AS (SELECT q_id, vec_id, rk FROM (
                   SELECT q_id, vec_id,
                          CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
                   FROM lsc) WHERE rk <= 5),
      j AS (SELECT probed.q_id, probed.rk,
                   coalesce(brute.rel, 0.0e0) AS rel
            FROM probed LEFT JOIN brute
              ON brute.q_id = probed.q_id AND brute.vec_id = probed.vec_id),
      per AS (SELECT q_id,
                     list([CAST(rk AS DOUBLE), rel] ORDER BY rk) AS ts,
                     MIN(CASE WHEN rel > 0 THEN rk END) AS frk
              FROM j GROUP BY q_id),
      idcg AS (SELECT list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, 6), i ->
                     (6.0e0 - CAST(i AS DOUBLE)) / log2(CAST(i AS DOUBLE) + 1.0e0))),
                 (a, v) -> a + v) AS ideal)
      SELECT q_id,
             CAST(floor((list_reduce(
                    list_prepend(CAST(0 AS DOUBLE),
                      list_transform(ts, x -> x[2] / log2(x[1] + 1.0e0))),
                    (a, v) -> a + v) / idcg.ideal) * 1e6 + 0.5) AS BIGINT)
               AS ndcg_e6,
             CAST(floor((CASE WHEN frk IS NULL THEN 0.0e0
                              ELSE 1.0e0 / CAST(frk AS DOUBLE) END) * 1e6 + 0.5)
               AS BIGINT) AS mrr_e6
      FROM per CROSS JOIN idcg ORDER BY q_id"""
    })

  /** LAYOUT-PRUNING EFFECTIVENESS under the oracle gate — the
    * measurement behind SCALE.md's clustering claims: the same rows
    * written under three layouts (single-column sort, Morton/Z-order,
    * Hilbert — [[graft.functions.Layout]]), sliced into 32
    * equal-population "files" by the DISTRIBUTED rank
    * ([[graft.operators.Ranks.globalRowNumber]] — no single-partition
    * window), per-file min/max stats collected, and 8 two-dimensional
    * probe boxes evaluated against them: a file scans iff its stats
    * rectangle intersects the box, exactly the parquet min/max pruning
    * a 100 TB reader performs. Expected physics (and the point of the
    * audit): Hilbert ≤ Morton < single-column for 2-D predicates. The
    * oracle replays all three rank orders, the file slicing, and the
    * intersection counts — the Hilbert side through the shared
    * [[graft.functions.Layout.hilbertCtesSql]] bit walk.
    */
  val q291LayoutPruning: QueryDef = QueryDef(
    "q291_layout_pruning",
    (s, dir) => {
      import graft.functions.Layout
      import graft.operators.Ranks
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("long").as("x"),
          (octet_length(col("text")) % 256).cast("long").as("y"))
      val withKeys = Layout.withHilbert(
        base.withColumn("zkey", Layout.zorder16(col("x"), col("y"))),
        order = 8, "x", "y", "hkey")
        .transform(graft.operators.ScopedCache.cache)
      val total = withKeys.agg(count(lit(1)).as("total"))
      val probes = s.range(8).select(col("id").as("probe_id"),
        (col("id") * 24).as("xlo"), (col("id") * 24 + 30).as("xhi"),
        (col("id") * 28).as("ylo"), (col("id") * 28 + 40).as("yhi"))
      def files(name: String, key: org.apache.spark.sql.Column) =
        Ranks.globalRowNumber(withKeys, Seq(key, col("doc_id")), "rnk")
          .crossJoin(broadcast(total))
          .withColumn("file_id",
            expr("(rnk - 1) div ((total + 31) div 32)"))
          .groupBy("file_id")
          .agg(min(col("x")).as("minx"), max(col("x")).as("maxx"),
            min(col("y")).as("miny"), max(col("y")).as("maxy"))
          .withColumn("layout", lit(name))
      val f = files("linear", col("x"))
        .unionByName(files("zorder", col("zkey")))
        .unionByName(files("hilbert", col("hkey")))
        .transform(graft.operators.ScopedCache.cache)
      // Materialize the shared keyed base BEFORE the three rank passes
      // run (the q195 pattern; r14 verdict): each globalRowNumber
      // evaluates its input three times (extremes, bucket counts, the
      // window) and the extremes/offsets broadcast subqueries execute as
      // CONCURRENT jobs at plan time — against an unmaterialized cache
      // the ~9 consumers race and re-derive the Hilbert/Morton bit walk
      // per job instead of once total. Runs after every ScopedCache
      // registration above (registrations reset eviction protection).
      withKeys.count()
      val nFiles = f.groupBy("layout")
        .agg(count(lit(1)).as("n_files"))
      val scanned = f.crossJoin(broadcast(probes))
        .filter(col("minx") <= col("xhi") && col("maxx") >= col("xlo") &&
          col("miny") <= col("yhi") && col("maxy") >= col("ylo"))
        .groupBy("layout")
        .agg(count(lit(1)).as("files_scanned"))
      nFiles.join(scanned, Seq("layout"), "left")
        .select(col("layout"), col("n_files"),
          coalesce(col("files_scanned"), lit(0L)).as("files_scanned"))
        .orderBy("layout")
    },
    Some {
      val (hilCtes, hilFinal) = graft.functions.Layout.hilbertCtesSql(
        8, "(SELECT DISTINCT x, y FROM d)")
      val zSql = graft.functions.Layout.zorder16Sql("x", "y")
      def layoutSql(name: String, rankedFrom: String) =
        s"""files_$name AS (
           |  SELECT (rn - 1) // ((cnt.total + 31) // 32) AS file_id,
           |         MIN(x) AS minx, MAX(x) AS maxx,
           |         MIN(y) AS miny, MAX(y) AS maxy
           |  FROM $rankedFrom CROSS JOIN cnt
           |  GROUP BY 1),
           |agg_$name AS (
           |  SELECT '$name' AS layout,
           |         (SELECT CAST(count(*) AS BIGINT) FROM files_$name)
           |           AS n_files,
           |         (SELECT CAST(count(*) AS BIGINT)
           |          FROM files_$name f, probes p
           |          WHERE f.minx <= p.xhi AND f.maxx >= p.xlo
           |            AND f.miny <= p.yhi AND f.maxy >= p.ylo)
           |           AS files_scanned)""".stripMargin.replace("\n", " ")
      s"""
      WITH d AS (SELECT doc_id,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS BIGINT) AS x,
                        CAST(octet_length(encode(text)) % 256 AS BIGINT) AS y
                 FROM documents),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS total FROM d),
      $hilCtes,
      rl AS (SELECT doc_id, x, y,
                    row_number() OVER (ORDER BY x, doc_id) AS rn FROM d),
      rz AS (SELECT doc_id, x, y,
                    row_number() OVER (ORDER BY $zSql, doc_id) AS rn FROM d),
      rh AS (SELECT d.doc_id, d.x, d.y,
                    row_number() OVER (ORDER BY h.hd, d.doc_id) AS rn
             FROM d JOIN $hilFinal h ON h.x0 = d.x AND h.y0 = d.y),
      probes AS (SELECT q AS probe_id, 24 * q AS xlo, 24 * q + 30 AS xhi,
                        28 * q AS ylo, 28 * q + 40 AS yhi
                 FROM unnest(range(8)) AS u(q)),
      ${layoutSql("linear", "rl")},
      ${layoutSql("zorder", "rz")},
      ${layoutSql("hilbert", "rh")}
      SELECT * FROM agg_linear
      UNION ALL SELECT * FROM agg_zorder
      UNION ALL SELECT * FROM agg_hilbert
      ORDER BY layout"""
    })

  /** ICEBERG SCHEMA EVOLUTION under the oracle gate — the metadata
    * layer's other job beside snapshot resolution: schemas are
    * versioned documents, field IDs are the STABLE identity (renames
    * keep the id, adds mint new ones), and a reader reconstructs "what
    * changed between the schema snapshot A wrote under and the current
    * one" by diffing on field id —
    * [[graft.operators.IcebergMetadata.schemaDiff]], which also
    * enforces the spec's promotion rules (int→long, float→double; any
    * other same-id retype declines). Per document a two-schema
    * metadata JSON is synthesized (rename on even hashes, widen on
    * every third, a drop on every fifth, 1–2 adds), parsed back
    * through the strict [[graft.operators.IcebergMetadata.parseMetadata]]
    * (schema-id coherence enforced), and diffed; the oracle recomputes
    * every class count in closed form.
    */
  val q292IcebergSchemaEvolution: QueryDef = QueryDef(
    "q292_iceberg_schema_evolution",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.map { r =>
        import graft.operators.IcebergMetadata
        import graft.operators.IcebergMetadata._
        val k = r.n % 3
        val extras = (0 until k).map(i =>
          Field(10 + i, s"x$i", Seq("string", "long", "double")(i % 3),
            required = false))
        val s0 = Schema(0, Vector(
          Field(1, "a", "long", required = true),
          Field(2, "b", "string", required = false),
          Field(3, "c", "int", required = false)) ++ extras)
        val drop = k > 0 && r.v % 5 == 0
        val nAdd = 1 + r.v % 2
        val s1 = Schema(1, Vector(
          Field(1, "a", "long", required = true),
          Field(2, if (r.v % 2 == 0) "b_renamed" else "b", "string",
            required = false),
          Field(3, "c", if (r.v % 3 == 0) "long" else "int",
            required = false)) ++
          (if (drop) extras.dropRight(1) else extras) ++
          (0 until nAdd).map(j =>
            Field(20 + j, s"new$j", "double", required = false)))
        val json = IcebergMetadata.synthMetadata(
          s"uuid-${r.doc_id}", s"s3://t/${r.doc_id}",
          Seq(
            SnapshotRef(9001L, 1L, 1000L, "ml/a.avro", "append", Some(0)),
            SnapshotRef(9002L, 2L, 2000L, "ml/b.avro", "append", Some(1))),
          currentId = 9002L, schemas = Seq(s0, s1),
          currentSchemaId = Some(1))
        val meta = IcebergMetadata.parseMetadata(json)
          .getOrElse(sys.error(s"metadata parse failed: doc ${r.doc_id}"))
        val wroteUnder = meta.snapshots.head.schemaId
          .flatMap(meta.schemaOf)
          .getOrElse(sys.error(s"schema 0 unresolved: doc ${r.doc_id}"))
        val cur = meta.currentSchema
          .getOrElse(sys.error(s"current schema unresolved: doc ${r.doc_id}"))
        val diff = IcebergMetadata.schemaDiff(wroteUnder, cur)
          .getOrElse(sys.error(s"schema diff declined: doc ${r.doc_id}"))
        (r.doc_id, cur.fields.length, diff.added.length,
          diff.dropped.length, diff.renamed.length, diff.widened.length,
          diff.unchanged.length)
      }
      probed.toDF("doc_id", "n_fields_current", "n_added", "n_dropped",
          "n_renamed", "n_widened", "n_unchanged")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id,
                   n % 3 AS k,
                   CASE WHEN n % 3 > 0 AND v % 5 = 0 THEN 1 ELSE 0 END AS dropped,
                   1 + v % 2 AS n_add,
                   CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END AS renamed,
                   CASE WHEN v % 3 = 0 THEN 1 ELSE 0 END AS widened
            FROM d)
      SELECT doc_id,
             CAST(3 + k - dropped + n_add AS INTEGER) AS n_fields_current,
             CAST(n_add AS INTEGER) AS n_added,
             CAST(dropped AS INTEGER) AS n_dropped,
             CAST(renamed AS INTEGER) AS n_renamed,
             CAST(widened AS INTEGER) AS n_widened,
             CAST(3 + k - dropped - renamed - widened AS INTEGER) AS n_unchanged
      FROM g ORDER BY doc_id"""))

  /** TOKENIZER FERTILITY PER LANGUAGE under the oracle gate — the
    * multilingual pretraining audit: a tokenizer trained on a
    * mixed-language corpus segments some languages into more pieces
    * per word than others (fertility), which skews effective compute
    * per language. The q230-trained vocabulary
    * ([[graft.operators.TextAnalysis.bpeTrain]], memoized per corpus)
    * segments the distinct-word table once
    * ([[graft.operators.TextAnalysis.bpeWordTokens]] — the fold runs
    * over the VOCABULARY, never per occurrence), occurrences equi-join
    * back, and per language the audit reports tokens-per-word and
    * chars-per-token as exact-integer ratios rounded by the shared
    * floor rule. The oracle replays the merges via the shared
    * [[BpeSql]] chain, so trainer and counter cannot drift.
    */
  val q293TokenizerFertility: QueryDef = QueryDef(
    "q293_tokenizer_fertility",
    (s, dir) => {
      import graft.functions.Det
      import graft.operators.TextAnalysis
      val docs = Tables.load(s, dir, "documents")
      val merges = TextAnalysis.bpeTrain(docs, rounds = 6)
        .orderBy("round").collect().map(_.getString(1))
      val wt = TextAnalysis.bpeWordTokens(docs, merges.toSeq)
      docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .join(wt, "w")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("nt")).as("n_tokens"),
          sum(length(col("w")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"), col("n_chars"),
          Det.rdetLong(col("n_tokens").cast("double") /
            col("n_words").cast("double"), 6).as("fertility_e6"),
          Det.rdetLong(col("n_chars").cast("double") /
            col("n_tokens").cast("double"), 6).as("chars_per_token_e6"))
        .orderBy("lang")
    },
    Some {
      val K = 6
      s"""
      WITH ${BpeSql.words},
      ${BpeSql.chain(K)},
      occ AS (SELECT lang, w FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS w
                FROM documents) WHERE w != ''),
      j AS (SELECT occ.lang, occ.w, length(occ.w) AS chars,
                   len(string_split(trim(sym$K.s), ' ')) AS nt
            FROM occ JOIN sym$K ON occ.w = sym$K.w),
      a AS (SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(SUM(nt) AS BIGINT) AS n_tokens,
                   CAST(SUM(chars) AS BIGINT) AS n_chars
            FROM j GROUP BY lang)
      SELECT lang, n_words, n_tokens, n_chars,
             CAST(floor((CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT) AS fertility_e6,
             CAST(floor((CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT) AS chars_per_token_e6
      FROM a ORDER BY lang"""
    })

  /** END-TO-END CURATION FUNNEL under the oracle gate — the composed
    * pipeline a pretraining corpus actually runs (the FineWeb shape),
    * with per-stage survivor AND token accounting so every filter's
    * cost in data is visible: ingest → language keep → quality
    * threshold ([[graft.operators.TextAnalysis.qualityScore]], the q30
    * formula bit-identical cross-engine) → repetition gate
    * (repeated-word ratio) → exact dedup (min-id per content hash) →
    * near-dup dedup (word-minhash banded buckets, keep the lowest id
    * any shared bucket has seen — bucket-level, not transitive
    * closure; q26 carries the closure). ONE enriched pass computes
    * every per-doc feature (flags, hash, 8 minhash signatures, the
    * token proxy); stages are chained filters plus two id-min
    * aggregations — no self-joins, no windows. The oracle replays the
    * whole funnel as a CTE chain, so a threshold slip, a tie-break
    * drift, or a bucket-key mismatch at ANY stage lands in the hash.
    */
  val q294CurationFunnel: QueryDef = QueryDef(
    "q294_curation_funnel",
    (s, dir) => {
      import graft.functions.HashFunctions
      import graft.operators.TextAnalysis
      val docs = Tables.load(s, dir, "documents")
      val quality = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("quality"))
      val enriched = docs
        .select(col("doc_id"), col("lang"), col("text"),
          expr("filter(split(text, ' '), t -> t != '')").as("w"),
          md5(col("text")).as("h"),
          regexp_count(col("text"), lit("[a-z]{1,4}|[0-9]+|[^a-z0-9 ]"))
            .cast("long").as("nbpe"))
        .withColumn("dup_ratio",
          (size(col("w")) - size(array_distinct(col("w")))).cast("double") /
            size(col("w")).cast("double"))
        .join(quality, "doc_id")
        .select(col("doc_id"), col("lang"), col("w"), col("h"),
          col("nbpe"), col("dup_ratio"), col("quality"))
        .transform(graft.operators.ScopedCache.cache)
      val s1 = enriched.filter(col("lang") === "en" && size(col("w")) > 0)
      val s2 = s1.filter(col("quality") >= 0.27d)
      val s3 = s2.filter(col("dup_ratio") <= 0.6d)
      val exactMin = s3.groupBy("h").agg(min(col("doc_id")).as("keep"))
      val s4 = s3.join(exactMin, "h")
        .filter(col("doc_id") === col("keep")).drop("keep")
        .transform(graft.operators.ScopedCache.cache)
      // 3-WORD-shingle minhash (the q25/q26 machinery, 4 bands x 2
      // rows ~ 0.5-Jaccard): word-set signatures are too coarse on a
      // small shared vocabulary (measured: they collapsed the stage to
      // 1-3 survivors), while ordered shingles discriminate. Docs too
      // short to shingle (<3 words) have no signature and cannot be
      // near-duplicates — they KEEP (left join, null-safe).
      val sigs = graft.operators.Dedup.minhashSignatures(docs, shingleK = 3)
      val bandArr = array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          concat_ws("_", col(s"sig_${2 * b}"), col(s"sig_${2 * b + 1}"))
            .as("key"))): _*)
      val bands = s4.join(sigs, "doc_id")
        .select(col("doc_id"), explode(bandArr).as("bk"))
        .select(col("doc_id"), col("bk.b").as("b"), col("bk.key").as("key"))
      val keyMin = bands.groupBy("b", "key").agg(min(col("doc_id")).as("m"))
      val docMin = bands.join(keyMin, Seq("b", "key"))
        .groupBy("doc_id").agg(min(col("m")).as("mm"))
      val s5 = s4.join(docMin, Seq("doc_id"), "left")
        .filter(col("mm").isNull || col("mm") === col("doc_id"))
      def stage(i: Int, name: String,
          df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("survivors"),
          coalesce(sum(col("nbpe")), lit(0L)).as("proxy_tokens"))
          .select(lit(i).as("stage_id"), lit(name).as("stage"),
            col("survivors"), col("proxy_tokens"))
      stage(0, "ingest", enriched)
        .unionAll(stage(1, "lang_en", s1))
        .unionAll(stage(2, "quality", s2))
        .unionAll(stage(3, "repetition", s3))
        .unionAll(stage(4, "exact_dedup", s4))
        .unionAll(stage(5, "near_dedup", s5))
        .orderBy("stage_id")
    },
    Some {
      val markers = graft.operators.TextAnalysis.LangMarkers.head._2
        .map(m => s"'$m'").mkString("(", ", ", ")")
      def st(i: Int, name: String, from: String) =
        s"""SELECT CAST($i AS INTEGER) AS stage_id, '$name' AS stage,
           |CAST(count(*) AS BIGINT) AS survivors,
           |CAST(coalesce(SUM(nbpe), 0) AS BIGINT) AS proxy_tokens
           |FROM $from""".stripMargin.replace("\n", " ")
      s"""
      WITH ${DedupQueries.shingleCtes},
      d0 AS (SELECT doc_id, lang, text,
                         list_filter(string_split(text, ' '), t -> t != '') AS w,
                         md5(text) AS h,
                         CAST(len(regexp_extract_all(text,
                           '[a-z]{1,4}|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS nbpe
                  FROM documents),
      q AS (SELECT doc_id,
                   0.5e0 * stopword_ratio
                     + 0.3e0 * least(avg_token_len / 10.0e0, 1.0e0)
                     + 0.2e0 * least(CAST(n_tokens AS DOUBLE) / 100.0e0, 1.0e0)
                     AS quality
            FROM (SELECT doc_id,
                         CAST(len(ws) AS BIGINT) AS n_tokens,
                         (CAST(length(text) AS DOUBLE) - CAST(len(ws) AS BIGINT)
                           + 1.0e0) / CAST(len(ws) AS BIGINT) AS avg_token_len,
                         CAST(CAST(len(list_filter(ws, t -> t IN $markers))
                           AS BIGINT) AS DOUBLE) / CAST(len(ws) AS BIGINT)
                           AS stopword_ratio
                  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
                        FROM documents))),
      s1 AS (SELECT d0.*, q.quality FROM d0 JOIN q USING (doc_id)
             WHERE lang = 'en' AND len(w) > 0),
      s2 AS (SELECT * FROM s1 WHERE quality >= 0.27e0),
      s3 AS (SELECT * FROM s2
             WHERE CAST(len(w) - len(list_distinct(w)) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) <= 0.6e0),
      em AS (SELECT h, min(doc_id) AS keep FROM s3 GROUP BY 1),
      s4 AS (SELECT s3.* FROM s3
             JOIN em ON s3.h = em.h AND s3.doc_id = em.keep),
      sg AS (SELECT s.doc_id,
                    [${(0 until 8).map(DedupQueries.sigExpr).mkString(", ")}] AS sg
             FROM s JOIN s4 ON s4.doc_id = s.doc_id),
      bands AS (SELECT doc_id, b,
                       sg[2 * b + 1]::VARCHAR || '_' || sg[2 * b + 2]::VARCHAR
                         AS key
                FROM sg, generate_series(0, 3) g(b)),
      km AS (SELECT b, key, min(doc_id) AS m FROM bands GROUP BY 1, 2),
      dm AS (SELECT bands.doc_id, min(km.m) AS mm
             FROM bands JOIN km USING (b, key) GROUP BY 1),
      s5 AS (SELECT s4.* FROM s4 LEFT JOIN dm ON dm.doc_id = s4.doc_id
             WHERE dm.mm IS NULL OR dm.mm = s4.doc_id)
      SELECT * FROM (
        ${st(0, "ingest", "d0")}
        UNION ALL ${st(1, "lang_en", "s1")}
        UNION ALL ${st(2, "quality", "s2")}
        UNION ALL ${st(3, "repetition", "s3")}
        UNION ALL ${st(4, "exact_dedup", "s4")}
        UNION ALL ${st(5, "near_dedup", "s5")})
      ORDER BY stage_id"""
    })


  /** Shared oracle tail for the Bradley–Terry fits (q282/q295): w0 init,
    * the K unrolled MM rounds in HUGEINT (the exact arithmetic
    * [[graft.operators.Preference.bradleyTerry]] runs), and the final
    * select. Expects CTEs `sym(a, b, n)` and `wins(item, w)` upstream.
    */
  private def btChainSql(k: Int): String = {
    val S = "1000000000"
    def round(i: Int): String = {
      val p = s"w${i - 1}"
      s"""
      d$i AS (SELECT sym.a AS item,
                     SUM(CAST(sym.n AS HUGEINT) * $S * $S // (wa.s + wb.s))
                       AS den
              FROM sym JOIN $p wa ON wa.item = sym.a
                       JOIN $p wb ON wb.item = sym.b
              GROUP BY 1),
      w$i AS (SELECT d$i.item,
                     GREATEST(CAST(CAST(coalesce(wins.w, 0) AS HUGEINT)
                       * $S * $S // d$i.den AS BIGINT), 1) AS s
              FROM d$i LEFT JOIN wins ON wins.item = d$i.item),"""
    }
    s"""w0 AS (SELECT DISTINCT a AS item, CAST($S AS BIGINT) AS s FROM sym),
      ${(1 to k).map(round).mkString}
      nc AS (SELECT a AS item, CAST(SUM(n) AS BIGINT) AS n_comparisons
             FROM sym GROUP BY 1)
      SELECT w$k.item,
             CAST(coalesce(wins.w, 0) AS BIGINT) AS wins,
             nc.n_comparisons,
             w$k.s AS strength
      FROM w$k LEFT JOIN wins ON wins.item = w$k.item
              JOIN nc ON nc.item = w$k.item
      ORDER BY 1"""
  }

  /** GROUPED BRADLEY–TERRY under the oracle gate — per-language
    * strength tables from WITHIN-LANGUAGE comparisons only (a
    * cross-language "win" is meaningless when the judge is text
    * length): the q282 pairing keeps only pairs whose documents share
    * a language, and the item identity becomes `lang/source`, so one
    * [[graft.operators.Preference.bradleyTerry]] fit solves every
    * language's table at once — grouping by KEY ENCODING, zero
    * operator changes, still ITEM²-bounded. The oracle reuses the
    * exact q282 HUGEINT round chain over the composite items.
    */
  val q295GroupedBradleyTerry: QueryDef = QueryDef(
    "q295_grouped_bradley_terry",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          expr("doc_id div 2").as("pid"),
          (col("n_chars") * lit(1000000000000L) - col("doc_id")).as("key"))
      val pr = d.groupBy("pid").agg(
        max_by(struct(col("lang"), col("source")), col("key")).as("w"),
        min_by(struct(col("lang"), col("source")), col("key")).as("l"),
        count(lit(1)).as("m"))
      val pw = pr.filter(col("m") === 2 &&
          col("w.lang") === col("l.lang") &&
          col("w.source") =!= col("l.source"))
        .select(concat_ws("/", col("w.lang"), col("w.source")).as("winner"),
          concat_ws("/", col("l.lang"), col("l.source")).as("loser"))
        .groupBy("winner", "loser").agg(count(lit(1)).cast("long").as("cnt"))
      graft.operators.Preference.bradleyTerry(pw, iters = 5)
        .orderBy("item")
    },
    Some {
      s"""
      WITH d AS (SELECT doc_id, lang, source,
                        doc_id // 2 AS pid,
                        n_chars * 1000000000000 - doc_id AS key
                 FROM documents),
      pr AS (SELECT pid,
                    max_by(lang, key) AS wl, max_by(source, key) AS ws,
                    min_by(lang, key) AS ll, min_by(source, key) AS ls,
                    count(*) AS m
             FROM d GROUP BY pid),
      pw AS (SELECT wl || '/' || ws AS winner, ll || '/' || ls AS loser,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM pr WHERE m = 2 AND wl = ll AND ws <> ls GROUP BY 1, 2),
      sym AS (SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n FROM (
                SELECT winner AS a, loser AS b, cnt FROM pw
                UNION ALL SELECT loser AS a, winner AS b, cnt FROM pw) u
              GROUP BY 1, 2),
      wins AS (SELECT winner AS item, CAST(SUM(cnt) AS BIGINT) AS w
               FROM pw GROUP BY 1),
      ${btChainSql(5)}"""
    })

  /** LSH PARAMETER AUDIT under the oracle gate — the tuning table an
    * LSH deployment reads before picking its banding: the SAME 8
    * minhash signatures banded three ways (8×1, 4×2, 2×4 — S-curve
    * thresholds ≈ 0.06 / 0.5 / 0.84 Jaccard), candidate counts per
    * config, and precision/recall against exact shingle Jaccard ≥ 0.5
    * evaluated over the 8×1 candidate set — which SUPERSETS every
    * multi-row config's candidates (a band match at r rows implies
    * each of its sigs matches alone), so within the audit the truth
    * restriction is exact; the unmeasured remainder is pairs with NO
    * matching signature, P ≈ (1−j)^8 (documented envelope, <0.4% at
    * j = 0.5). Ratios are exact integer arithmetic.
    */
  val q296LshParamAudit: QueryDef = QueryDef(
    "q296_lsh_param_audit",
    (s, dir) => {
      import graft.operators.{Dedup, ScopedCache}
      val docs = Tables.load(s, dir, "documents")
      val sigs = ScopedCache.cache(Dedup.minhashSignatures(docs, shingleK = 3))
      def cands(rowsPerBand: Int) = {
        val nBands = 8 / rowsPerBand
        val banded = sigs.select(col("doc_id"),
          explode(array((0 until nBands).map { b =>
            struct(lit(b).as("band"),
              concat_ws("_", (0 until rowsPerBand).map(r =>
                col(s"sig_${b * rowsPerBand + r}")): _*).as("key"))
          }: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"),
            col("bk.key").as("key"))
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") &&
              col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
      }
      val sh = ScopedCache.cache(
        docs.filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"), Dedup.hashedShingles(col("text"), 3).as("sh")))
      val inter = graft.plans.SortedLongArrayIntersectCount(
        col("sh_a"), col("sh_b"))
      val truth = ScopedCache.cache(cands(1)
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .filter(inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter) >= 0.5d)
        .select("doc_a", "doc_b"))
      def audit(rowsPerBand: Int) = {
        val c = ScopedCache.cache(cands(rowsPerBand))
        val hits = c.join(truth, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_hits"))
        c.agg(count(lit(1)).as("n_candidates"))
          .crossJoin(hits)
          .crossJoin(truth.agg(count(lit(1)).as("n_true")))
          .select(lit(rowsPerBand).as("rows_per_band"),
            lit(8 / rowsPerBand).as("n_bands"),
            col("n_candidates"), col("n_true"), col("n_hits"),
            when(col("n_candidates") === 0L, 0L)
              .otherwise(expr("(n_hits * 1000000) div n_candidates"))
              .as("precision_e6"),
            when(col("n_true") === 0L, 0L)
              .otherwise(expr("(n_hits * 1000000) div n_true"))
              .as("recall_e6"))
      }
      audit(1).unionAll(audit(2)).unionAll(audit(4))
        .orderBy("rows_per_band")
    },
    Some {
      val sigList = (0 until 8).map(DedupQueries.sigExpr).mkString(", ")
      def candCte(r: Int): String = {
        val nb = 8 / r
        val key = (0 until r).map(i => s"sg[$r * b + ${i + 1}]::VARCHAR")
          .mkString(" || '_' || ")
        s"""bands_$r AS (SELECT doc_id, b, $key AS key
           |  FROM sg, generate_series(0, ${nb - 1}) g(b)),
           |cand_$r AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands_$r a JOIN bands_$r b
           |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)"""
          .stripMargin.replace("\n", " ")
      }
      def auditRow(r: Int): String =
        s"""SELECT CAST($r AS INTEGER) AS rows_per_band,
           |  CAST(${8 / r} AS INTEGER) AS n_bands,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand_$r) AS n_candidates,
           |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand_$r c
           |     JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
           |    AS n_hits""".stripMargin.replace("\n", " ")
      s"""
      WITH ${DedupQueries.shingleCtes},
      sg AS (SELECT doc_id,
                    [$sigList] AS sg,
                    list_distinct(list_transform(sh,
                      t -> ${DedupQueries.h32("t")})) AS hs
             FROM s),
      ${candCte(1)},
      ${candCte(2)},
      ${candCte(4)},
      truth AS (SELECT doc_a, doc_b FROM (
                  SELECT c.doc_a, c.doc_b,
                         CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                           / (len(sa.hs) + len(sb.hs)
                              - len(list_intersect(sa.hs, sb.hs))) AS j
                  FROM cand_1 c JOIN sg sa ON sa.doc_id = c.doc_a
                                JOIN sg sb ON sb.doc_id = c.doc_b)
                WHERE j >= 0.5e0)
      SELECT rows_per_band, n_bands, n_candidates, n_true, n_hits,
             CASE WHEN n_candidates = 0 THEN 0
                  ELSE n_hits * 1000000 // n_candidates END AS precision_e6,
             CASE WHEN n_true = 0 THEN 0
                  ELSE n_hits * 1000000 // n_true END AS recall_e6
      FROM (${auditRow(1)} UNION ALL ${auditRow(2)} UNION ALL ${auditRow(4)})
      ORDER BY rows_per_band"""
    })

  val all: Seq[QueryDef] = Seq(q281DeltaCheckpoint, q282BradleyTerry,
    q283KneserNey, q284DsirImportance, q285IcebergPruning, q286DeltaCdc,
    q287IcebergIncremental, q288DeltaCheckpointStream, q289ExifGpsStrip,
    q290RetrievalNdcg, q291LayoutPruning, q292IcebergSchemaEvolution,
    q293TokenizerFertility, q294CurationFunnel, q295GroupedBradleyTerry,
    q296LshParamAudit)
}
