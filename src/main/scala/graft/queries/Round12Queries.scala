package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 additions. Focus: the trained tokenizer as the pipeline's
  * budget currency everywhere it pays (packing), plus the curation,
  * lakehouse-maintenance, and preference-data operators a 100 TB
  * training-data pipeline still lacked.
  */
object Round12Queries {

  /** SEQUENCE PACKING UNDER THE TRAINED VOCABULARY — the round-11
    * verdict's standing ask: [[graft.operators.CorpusOps.sequencePack]]
    * budgeted packs on the whitespace proxy, while the SFT truncation
    * (q275) already counted trained tokens. Here the corpus trains six
    * BPE merges ([[graft.operators.TextAnalysis.bpeTrain]], memoized),
    * every document is costed by its trained segmentation
    * ([[graft.operators.TextAnalysis.bpeTokenCounts]] — a
    * vocabulary-sized fold equi-joined to occurrences, never a per-doc
    * re-tokenization), and
    * [[graft.operators.CorpusOps.sequencePackBy]] runs the same
    * per-source streaming cumsum over THOSE counts. The oracle replays
    * the six merge rounds via the shared [[BpeSql]] chain and recomputes
    * the packing window in closed form, so a drift in the trained
    * segmentation OR the pack arithmetic lands in the hash.
    */
  val q297PackBpeBudget: QueryDef = QueryDef(
    "q297_pack_bpe_budget",
    (s, dir) => {
      import graft.operators.{CorpusOps, TextAnalysis}
      val docs = Tables.load(s, dir, "documents")
      val merges = TextAnalysis.bpeTrain(docs, rounds = 6)
        .orderBy("round").collect().map(_.getString(1)).toSeq
      val toks = TextAnalysis.bpeTokenCounts(docs, merges)
        .select(col("doc_id"), col("n_bpe_tokens").as("tok"))
      CorpusOps.sequencePackBy(docs, toks, capacity = 512)
    },
    Some {
      val K = 6
      s"""
      WITH ${BpeSql.words},
      ${BpeSql.chain(K)},
      nt AS (SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS nt
             FROM sym$K),
      occ AS (SELECT doc_id, ws[u.i] AS w
              FROM (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
                   unnest(range(1, len(ws) + 1)) AS u(i)
              WHERE ws[u.i] != ''),
      dt AS (SELECT o.doc_id, SUM(nt.nt) AS tok
             FROM occ o JOIN nt ON o.w = nt.w GROUP BY 1),
      base AS (SELECT d.source, d.doc_id, COALESCE(dt.tok, 0) AS tok
               FROM documents d LEFT JOIN dt ON d.doc_id = dt.doc_id),
      cum AS (SELECT source, doc_id, tok,
                     CAST(COALESCE(SUM(tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cb
              FROM base)
      SELECT source, cb // 512 AS pack_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tok_sum,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM cum GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  /** CURRICULUM STAGING BY UNIGRAM SURPRISAL — the data-ordering
    * operator of curriculum training: each document's difficulty is its
    * mean unigram surprisal (-log2 of corpus frequency, the standard
    * easy-to-hard proxy), and the corpus is cut into 4 equal-population
    * stages by a DISTRIBUTED global rank
    * ([[graft.operators.Ranks.globalRowNumber]] — never a
    * single-partition window), reporting each stage's population,
    * difficulty bounds, English share, and token mass. Determinism
    * discipline: the per-doc float fold runs word-sorted (the q283
    * order-pinned-fold protocol) and the rank orders on the ROUNDED
    * e6 integer, so stage boundaries are engine-identical.
    */
  val q298CurriculumStages: QueryDef = QueryDef(
    "q298_curriculum_stages",
    (s, dir) => {
      val occ = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .transform(graft.operators.ScopedCache.cache)
      val wc = occ.groupBy("w").agg(count(lit(1)).as("c"))
      val tot = occ.agg(count(lit(1)).as("t"),
        count_distinct(col("doc_id")).as("nd"))
      val dw = occ.groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("n"))
      val diff = dw.join(broadcast(wc), "w")
        .groupBy("doc_id", "lang")
        .agg(sum(col("n")).as("n_words"),
          array_sort(collect_list(struct(col("w"), col("n"), col("c"))))
            .as("terms"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("lang"), col("n_words"), col("nd"),
          floor(aggregate(col("terms"), lit(0.0d),
            (acc, x) => acc + x("n") * log2(col("t").cast("double") / x("c"))) /
            col("n_words") * 1e6 + 0.5).cast("long").as("diff_e6"))
      // the rank references its input from three subtrees (extent agg,
      // bucket offsets, the bucketed window) — cache the per-doc fold so
      // the explode+join+fold pipeline above runs once, not three times
      val diffC = graft.operators.ScopedCache.cache(diff)
      graft.operators.Ranks.globalRowNumber(diffC,
          Seq(col("diff_e6"), col("doc_id")), "rn")
        .withColumn("stage", expr("((rn - 1) * 4) div nd") + 1)
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"),
          min("diff_e6").as("lo_e6"), max("diff_e6").as("hi_e6"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          sum("n_words").as("tok_sum"))
        .orderBy("stage")
    },
    Some("""
      WITH occ AS (SELECT doc_id, lang, w
                   FROM (SELECT doc_id, lang,
                                unnest(string_split(text, ' ')) AS w
                         FROM documents)
                   WHERE w != ''),
      wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS t,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM occ),
      dw AS (SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS n
             FROM occ GROUP BY 1, 2, 3),
      terms AS (SELECT doc_id, lang, CAST(SUM(n) AS BIGINT) AS n_words,
                       list([w, CAST(n AS VARCHAR), CAST(c AS VARCHAR)]
                            ORDER BY w) AS ts
                FROM dw JOIN wc USING (w) GROUP BY 1, 2),
      diff AS (SELECT doc_id, lang, n_words, nd,
                      CAST(floor(list_reduce(
                        list_prepend(CAST(0 AS DOUBLE),
                          list_transform(ts, x -> CAST(x[2] AS DOUBLE)
                            * log2(CAST(t AS DOUBLE) / CAST(x[3] AS DOUBLE)))),
                        (acc, v) -> acc + v) / n_words * 1e6 + 0.5)
                        AS BIGINT) AS diff_e6
               FROM terms CROSS JOIN tot),
      rk AS (SELECT *, row_number() OVER (ORDER BY diff_e6, doc_id) AS rn
             FROM diff)
      SELECT ((rn - 1) * 4) // nd + 1 AS stage,
             CAST(count(*) AS BIGINT) AS n_docs,
             min(diff_e6) AS lo_e6, max(diff_e6) AS hi_e6,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
             CAST(SUM(n_words) AS BIGINT) AS tok_sum
      FROM rk GROUP BY 1 ORDER BY 1"""))

  /** MEMORIZATION-RISK N-GRAMS — the intra-corpus twin of q101's
    * decontamination: a 6-gram repeated across documents is exactly what
    * a model memorizes verbatim, so the audit surfaces the top shared
    * 6-grams with their document reach and occurrence mass. Pure
    * explode → hash aggregate → TakeOrderedAndProject: the filter
    * (n_docs ≥ 2) collapses the corpus-sized gram relation to the risky
    * tail before the top-k, and the top-100 runs as a distributed
    * partial top-k, never a global sort.
    */
  val q299MemorizationGrams: QueryDef = QueryDef(
    "q299_memorization_grams",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 6)
        .select(col("doc_id"),
          explode(graft.plans.WordGrams(col("text"), 6, ' ')).as("gram"))
        .groupBy("gram")
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(100)
    },
    Some("""
      WITH g AS (SELECT doc_id,
                        array_to_string(list_slice(ws, i, i + 5), ' ') AS gram
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 6),
                      unnest(range(1, len(ws) - 4)) AS u(i))
      SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occ,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
      ORDER BY n_docs DESC, gram LIMIT 100"""))

  /** PARAGRAPH-BLOCK DEDUP ACCOUNTING — the line/paragraph-level scrub
    * of CCNet/RefinedWeb re-expressed over 8-word blocks: a block shared
    * by ≥ 2 documents is boilerplate and is dropped from every document
    * carrying it; the audit reports each document's block census and
    * post-scrub word count. One explode → block-frequency aggregate →
    * equi-join back — block frequency is corpus-wide state reached by
    * hash shuffle, never a doc×doc comparison, and the trailing <8-word
    * tail is always kept.
    */
  val q302BlockDedup: QueryDef = QueryDef(
    "q302_block_dedup",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val blocks = d.filter(size(col("ws")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) div 8 - 1)," +
            " i -> concat_ws(' ', slice(ws, 8 * i + 1, 8)))")).as("blk"))
        .transform(graft.operators.ScopedCache.cache)
      val freq = blocks.groupBy("blk")
        .agg(count_distinct(col("doc_id")).as("ndd"))
      val per = blocks.join(freq, "blk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("ndd") >= 2, 1L).otherwise(0L)).as("shared_blocks"))
      d.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
        .join(per, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_blocks", "shared_blocks"))
        .withColumn("kept_words",
          col("n_words") - lit(8L) * col("shared_blocks"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      b AS (SELECT doc_id,
                   array_to_string(list_slice(ws, 8 * i + 1, 8 * i + 8), ' ')
                     AS blk
            FROM d, unnest(range(0, len(ws) // 8)) AS u(i)
            WHERE len(ws) >= 8),
      f AS (SELECT blk, count(DISTINCT doc_id) AS ndd FROM b GROUP BY 1),
      per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
                     CAST(SUM(CASE WHEN ndd >= 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS shared_blocks
              FROM b JOIN f USING (blk) GROUP BY 1)
      SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             COALESCE(per.n_blocks, 0) AS n_blocks,
             COALESCE(per.shared_blocks, 0) AS shared_blocks,
             CAST(len(ws) AS BIGINT) - 8 * COALESCE(per.shared_blocks, 0)
               AS kept_words
      FROM d LEFT JOIN per USING (doc_id) ORDER BY doc_id"""))

  /** TEMPERATURE-SMOOTHED SOURCE MIXTURE — the multilingual sampling
    * rule (mT5/XLM-R, alpha = 0.5): upsample small sources by sampling
    * source i with probability c_i^alpha / Σ c_j^alpha instead of its
    * raw share. Source cardinality is tiny, so the Σ sqrt fold runs
    * order-pinned over the source-sorted list in ONE aggregate row (the
    * q283 protocol — float addition order is part of the contract), and
    * each source reports its raw share, temperature share, and boost
    * factor, all rdet-rounded.
    */
  val q303TemperatureMix: QueryDef = QueryDef(
    "q303_temperature_mix",
    (s, dir) => {
      import graft.functions.Det
      val srcs = Tables.load(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("c"))
      val tot = srcs.agg(
          array_sort(collect_list(struct(col("source"), col("c")))).as("arr"),
          sum(col("c")).as("n"))
        .select(col("n"),
          aggregate(col("arr"), lit(0.0d),
            (acc, x) => acc + sqrt(x("c").cast("double"))).as("z"))
      srcs.crossJoin(broadcast(tot))
        .select(col("source"), col("c").as("n_docs"),
          Det.rdet(col("c").cast("double") / col("n"), 6).as("p_uniform"),
          Det.rdet(sqrt(col("c").cast("double")) / col("z"), 6).as("p_temp"),
          Det.rdet(sqrt(col("c").cast("double")) * col("n") /
            (col("z") * col("c")), 6).as("boost"))
        .orderBy("source")
    },
    Some("""
      WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS c
                 FROM documents GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(list(CAST(c AS DOUBLE) ORDER BY source),
                         x -> sqrt(x))),
                       (acc, v) -> acc + v) AS z
              FROM s)
      SELECT source, c AS n_docs,
             floor(CAST(c AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS p_uniform,
             floor(sqrt(CAST(c AS DOUBLE)) / z * 1e6 + 0.5) / 1e6 AS p_temp,
             floor(sqrt(CAST(c AS DOUBLE)) * n / (z * c) * 1e6 + 0.5) / 1e6
               AS boost
      FROM s CROSS JOIN tot ORDER BY source"""))

  /** K-ANONYMITY AUDIT over quasi-identifiers — the governance check a
    * pipeline shipping user-derived documents owes its privacy review:
    * every (lang, source, length-bucket) equivalence class with fewer
    * than k = 5 members re-identifies its members by those attributes
    * alone. Pure hash aggregate over the quasi-identifier tuple; class
    * count is corpus-wide state, no row-level comparisons.
    */
  val q304KAnonymity: QueryDef = QueryDef(
    "q304_k_anonymity",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("lang"), col("source"),
          expr("n_chars div 200").as("len_bucket"))
        .groupBy("lang", "source", "len_bucket")
        .agg(count(lit(1)).as("class_n"))
        .withColumn("at_risk", (col("class_n") < 5).cast("int"))
        .orderBy("lang", "source", "len_bucket")
    },
    Some("""
      SELECT lang, source, n_chars // 200 AS len_bucket,
             CAST(count(*) AS BIGINT) AS class_n,
             CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS INTEGER)
               AS at_risk
      FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** GROUP-RELATIVE ADVANTAGE (the GRPO/RLOO preparation step): per
    * prompt group of candidate completions, each item's advantage is its
    * reward minus the group mean — computed EXACTLY as
    * (r·n − Σr)·1e6 div n in integer arithmetic (both engines truncate
    * toward zero), so no float mean ever enters the compare — plus its
    * within-group rank. Windows partition by group (many small groups:
    * the parallel-friendly case), never unpartitioned.
    */
  val q306GroupAdvantage: QueryDef = QueryDef(
    "q306_group_advantage",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), expr("doc_id div 8").as("grp"),
          pmod(col("n_chars"), lit(97)).cast("long").as("r"))
      val w = Window.partitionBy("grp")
      val wr = Window.partitionBy("grp").orderBy(col("r").desc, col("doc_id"))
      d.withColumn("gn", count(lit(1)).over(w))
        .withColumn("gs", sum(col("r")).over(w))
        .withColumn("adv_e6", expr("((r * gn - gs) * 1000000) div gn"))
        .withColumn("rk", row_number().over(wr))
        .select("doc_id", "grp", "r", "adv_e6", "rk")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, doc_id // 8 AS grp,
                        CAST(n_chars % 97 AS BIGINT) AS r
                 FROM documents)
      SELECT doc_id, grp, r,
             ((r * CAST(count(*) OVER (PARTITION BY grp) AS BIGINT)
               - CAST(SUM(r) OVER (PARTITION BY grp) AS BIGINT)) * 1000000)
               // CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS adv_e6,
             CAST(row_number() OVER (PARTITION BY grp ORDER BY r DESC, doc_id)
               AS INTEGER) AS rk
      FROM d ORDER BY doc_id"""))

  /** ICEBERG SNAPSHOT-EXPIRY ORPHAN AUDIT — the table-maintenance
    * question `expireSnapshots` must answer before deleting anything:
    * with snapshot B current and snapshot A expiring, which data files
    * are reachable ONLY from A (live in A's manifests, but deleted or
    * absent in B's) and which manifests only A's list references? Per
    * document a two-snapshot table is SYNTHESIZED as real Avro manifest
    * chains under all three codecs (the q287 shape: B keeps a0
    * byte-identical, rewrites a1 with its first 1+v%2 files flipped
    * DELETED, appends a fresh b2), both snapshots replay through the
    * arithmetic-enforcing [[graft.operators.IcebergManifests.replay]],
    * and the orphan set is liveA − liveB. The oracle recomputes every
    * count and byte total from the synthesis rules in closed form.
    */
  val q300IcebergExpiry: QueryDef = QueryDef(
    "q300_iceberg_expiry_orphans",
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
          val a0e = (0 until 2 + r.n % 3).map(i =>
            ManifestEntry(1, Some(9001L),
              df("a0", i, 100L + (r.n + i) % 40, 500L + (r.v + 3 * i) % 100)))
          val a1e = (0 until 2 + r.v % 3).map(i =>
            ManifestEntry(1, Some(9001L),
              df("a1", i, 80L + (r.v + 2 * i) % 30, 400L + (r.n + 5 * i) % 90)))
          val a0 = IcebergManifests.synthManifest(a0e, partType, codec, r.v)
          val a1 = IcebergManifests.synthManifest(a1e, partType, codec, r.v + 1)
          val listA = IcebergManifests.synthManifestList(
            Seq(mf("meta/a0.avro", a0, a0e), mf("meta/a1.avro", a1, a1e)),
            codec, r.v + 2)
          // expiring A with B retained: a1's first k files die in B
          val k = 1 + r.v % 2
          val b1e = a1e.zipWithIndex.map { case (e, i) =>
            if (i < k) e.copy(status = 2) else e.copy(status = 0)
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
          val liveB = stB.live.map(_.path).toSet
          val orphans = stA.live.filterNot(f => liveB.contains(f.path))
          val mlA = IcebergManifests.readManifestList(listA)
            .getOrElse(sys.error("manifest list A unreadable"))
          val mlB = IcebergManifests.readManifestList(listB)
            .getOrElse(sys.error("manifest list B unreadable"))
          val bPaths = mlB.map(_.path).toSet
          (r.doc_id, codec, stA.live.size, stB.live.size,
            orphans.size, orphans.map(_.recordCount).sum,
            orphans.map(_.fileSizeBytes).sum,
            mlA.count(m => !bPaths.contains(m.path)))
        }
      }
      probed.toDF("doc_id", "codec", "n_live_a", "n_live_b",
          "n_orphan_files", "orphan_rows", "orphan_bytes",
          "n_orphan_manifests")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + n % 3 AS a0c, 2 + v % 3 AS a1c,
                   1 + v % 2 AS k, 1 + (n + v) % 3 AS b2c
            FROM d)
      SELECT doc_id,
             (['null', 'deflate', 'snappy'])[v % 3 + 1] AS codec,
             CAST(a0c + a1c AS INTEGER) AS n_live_a,
             CAST(a0c + (a1c - k) + b2c AS INTEGER) AS n_live_b,
             CAST(k AS INTEGER) AS n_orphan_files,
             CAST(list_sum(list_transform(range(k),
               i -> 80 + (v + 2 * i) % 30)) AS BIGINT) AS orphan_rows,
             CAST(list_sum(list_transform(range(k),
               i -> 400 + (n + 5 * i) % 90)) AS BIGINT) AS orphan_bytes,
             CAST(1 AS INTEGER) AS n_orphan_manifests
      FROM g ORDER BY doc_id"""))

  /** DELTA VACUUM AUDIT — the retention question behind `VACUUM RETAIN`:
    * which tombstoned files are physically reclaimable at version 70
    * under a 60 000 ms horizon, and how many bytes does each free? The
    * same synthesized action log as q286 (adds, tail removes at
    * timestamp n·1000, re-adds resurrecting every v%9==0 path) flows
    * through [[graft.operators.DeltaReplay.vacuumCandidates]] — one
    * hash aggregation per path carrying last state AND last-add size;
    * a resurrected path must never surface. The oracle recomputes
    * eligibility and sizes from the synthesis rules.
    */
  val q305DeltaVacuum: QueryDef = QueryDef(
    "q305_delta_vacuum",
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
      graft.operators.DeltaReplay
        .vacuumCandidates(log, asOf = 70L, horizonTs = 60000L)
        .orderBy("path")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS INTEGER) AS v
                 FROM documents)
      SELECT 'part-' || doc_id AS path,
             CAST(58 + v % 5 AS BIGINT) AS removed_version,
             CAST(n * 1000 AS BIGINT) AS del_ts,
             n AS size,
             n * 1000 < 60000 AS eligible
      FROM d WHERE v % 3 = 0 AND v % 9 <> 0 ORDER BY path"""))

  /** PQ SHORTLIST RADIUS AUDIT — the q296 protocol applied to the
    * two-stage ANN: at Hamming radii 2/4/6 over the 16-bit
    * [[graft.operators.Similarity.pqCode]],
    * [[graft.operators.Similarity.topKPqRerank]] shortlists by code
    * distance and re-ranks exactly; per (radius, query) the audit
    * reports shortlist size and recall@10 against the brute-force truth
    * — the measured S-curve behind choosing the probe radius. Brute
    * truth is computed once and ScopedCache'd across the three radii;
    * the query side broadcasts everywhere; recall is exact integer
    * (hits × 1000 at k = 10).
    */
  val q301PqRerankRecall: QueryDef = QueryDef(
    "q301_pq_rerank_recall",
    (s, dir) => {
      import graft.operators.Similarity
      val e = Tables.load(s, dir, "embeddings")
      val brute = Similarity.topKBrute(e, nQueries = 10, k = 10)
        .select(col("q_id"), col("vec_id"))
        .transform(graft.operators.ScopedCache.cache)
      Seq(2, 4, 6).map { h =>
        val rr = Similarity.topKPqRerank(e, nQueries = 10, k = 10, radius = h)
          .select(col("q_id"), col("vec_id"))
        val hits = brute.join(rr, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
        Similarity.pqCandidateCounts(e, nQueries = 10, radius = h)
          .join(hits, Seq("q_id"), "left")
          .na.fill(0L, Seq("n_hits"))
          .select(lit(h).as("radius"), col("q_id"), col("n_candidates"),
            col("n_hits"), (col("n_hits") * 1000L).as("recall_e4"))
      }.reduce(_ unionAll _).orderBy("radius", "q_id")
    },
    Some {
      val code = SimilarityQueries.pqCodeSql
      val cos = SimilarityQueries.rdet6(
        SimilarityQueries.cosSql("c.embedding", "q.embedding"))
      s"""
      WITH coded AS (SELECT vec_id, embedding, ($code) AS pq_code
                     FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding, pq_code AS q_code
            FROM coded WHERE vec_id < 10),
      radii AS (SELECT unnest([2, 4, 6]) AS radius),
      cand AS (SELECT r.radius, q.q_id, c.vec_id, $cos AS cos
               FROM radii r, q, coded c
               WHERE c.vec_id <> q.q_id
                 AND bit_count(xor(c.pq_code, q.q_code)) <= r.radius),
      nc AS (SELECT radius, q_id, CAST(count(*) AS BIGINT) AS n_candidates
             FROM cand GROUP BY 1, 2),
      rr AS (SELECT radius, q_id, vec_id,
                    row_number() OVER (PARTITION BY radius, q_id
                      ORDER BY cos DESC, vec_id) AS rk
             FROM cand),
      brute AS (SELECT q_id, vec_id FROM (
                  SELECT q.q_id, c.vec_id,
                         row_number() OVER (PARTITION BY q.q_id
                           ORDER BY $cos DESC, c.vec_id) AS rk
                  FROM q, embeddings c WHERE c.vec_id <> q.q_id)
                WHERE rk <= 10),
      hits AS (SELECT rr.radius, rr.q_id,
                      CAST(count(*) AS BIGINT) AS n_hits
               FROM rr JOIN brute
                 ON rr.q_id = brute.q_id AND rr.vec_id = brute.vec_id
               WHERE rr.rk <= 10 GROUP BY 1, 2)
      SELECT r.radius, q.q_id,
             COALESCE(nc.n_candidates, 0) AS n_candidates,
             COALESCE(hits.n_hits, 0) AS n_hits,
             COALESCE(hits.n_hits, 0) * 1000 AS recall_e4
      FROM radii r CROSS JOIN q
      LEFT JOIN nc ON nc.radius = r.radius AND nc.q_id = q.q_id
      LEFT JOIN hits ON hits.radius = r.radius AND hits.q_id = q.q_id
      ORDER BY r.radius, q.q_id"""
    })

  /** SLIDING-WINDOW RAG CHUNKING — the retrieval-ingest operator
    * ([[graft.operators.CorpusOps.slidingChunks]]): 32-word windows every
    * 24 words (8-word overlap), one row per chunk with offset, length,
    * character count and first word. Pure per-document expression work —
    * no shuffle anywhere in the chunker itself.
    */
  val q307SlidingChunks: QueryDef = QueryDef(
    "q307_sliding_chunks",
    (s, dir) => graft.operators.CorpusOps
      .slidingChunks(Tables.load(s, dir, "documents"), width = 32, stride = 24)
      .orderBy("doc_id", "chunk_id"),
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
      c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n, ws, u.j
            FROM d, unnest(range(0, (len(ws) - 1) // 24 + 1)) AS u(j)
            WHERE len(ws) > 0)
      SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
             CAST(j * 24 + 1 AS BIGINT) AS start_word,
             least(32, n - j * 24) AS chunk_len,
             CAST(length(array_to_string(
               list_slice(ws, j * 24 + 1, j * 24 + 32), ' ')) AS BIGINT)
               AS chunk_chars,
             ws[j * 24 + 1] AS first_word
      FROM c ORDER BY doc_id, chunk_id"""))

  /** TOKEN-BUDGET MIXTURE SOLVER — given per-source token masses and the
    * sqrt-smoothed target weights (q303's rule applied to token mass),
    * how many epochs must each source repeat to fill a 200k-token budget
    * slice, and what remains unserved under the 4-epoch repetition cap
    * (the data-constrained-scaling guard)? The Σ√m normalizer folds
    * order-pinned over the source-sorted list; everything after the
    * rounded `need` is exact integer arithmetic.
    */
  val q308MixtureBudget: QueryDef = QueryDef(
    "q308_mixture_budget",
    (s, dir) => {
      val m = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("source").agg(sum("tok").as("m"))
      val tot = m.agg(
          array_sort(collect_list(struct(col("source"), col("m")))).as("arr"))
        .select(aggregate(col("arr"), lit(0.0d),
          (acc, x) => acc + sqrt(x("m").cast("double"))).as("z"))
      m.crossJoin(broadcast(tot))
        .withColumn("need",
          floor(sqrt(col("m").cast("double")) * lit(200000d) / col("z") + 0.5)
            .cast("long"))
        .select(col("source"), col("m").as("m_tokens"),
          col("need").as("need_tokens"),
          expr("(need + m - 1) div m").as("epochs"),
          least(expr("(need + m - 1) div m"), lit(4L)).as("capped_epochs"),
          least(col("need"), col("m") * 4).as("served_tokens"),
          greatest(col("need") - col("m") * 4, lit(0L)).as("deficit_tokens"))
        .orderBy("source")
    },
    Some("""
      WITH s AS (SELECT source,
                        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS m
                 FROM documents GROUP BY 1),
      tot AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(list(CAST(m AS DOUBLE) ORDER BY source),
                  x -> sqrt(x))),
                (acc, v) -> acc + v) AS z FROM s),
      q AS (SELECT source, m,
                   CAST(floor(sqrt(CAST(m AS DOUBLE)) * 200000 / z + 0.5)
                     AS BIGINT) AS need
            FROM s CROSS JOIN tot)
      SELECT source, m AS m_tokens, need AS need_tokens,
             (need + m - 1) // m AS epochs,
             least((need + m - 1) // m, 4) AS capped_epochs,
             least(need, m * 4) AS served_tokens,
             greatest(need - m * 4, 0) AS deficit_tokens
      FROM q ORDER BY source"""))

  /** CONTRASTIVE PAIR MINING
    * ([[graft.operators.Similarity.contrastiveMining]]): per anchor, the
    * best positive (cos ≥ 0.35) and the hardest negative (highest cos
    * below it) from ONE conditional-max_by hash aggregation over the
    * label-blocked candidate relation — the (anchor, positive, hard
    * negative, margin) triplets an embedding fine-tune trains on.
    */
  val q309ContrastiveMining: QueryDef = QueryDef(
    "q309_contrastive_mining",
    (s, dir) => graft.operators.Similarity
      .contrastiveMining(Tables.load(s, dir, "embeddings"), threshold = 0.35)
      .orderBy("anchor"),
    Some {
      val cos = SimilarityQueries.rdet6(
        SimilarityQueries.cosSql("a.embedding", "b.embedding"))
      s"""
      WITH pr AS (SELECT a.vec_id AS anchor, b.vec_id AS cand, $cos AS cos
                  FROM embeddings a JOIN embeddings b
                    ON a.label = b.label AND a.vec_id <> b.vec_id),
      pos AS (SELECT anchor, cand, cos FROM (
                SELECT anchor, cand, cos, row_number() OVER (
                  PARTITION BY anchor ORDER BY cos DESC, cand) AS rn
                FROM pr WHERE cos >= 0.35e0) WHERE rn = 1),
      neg AS (SELECT anchor, cand, cos FROM (
                SELECT anchor, cand, cos, row_number() OVER (
                  PARTITION BY anchor ORDER BY cos DESC, cand) AS rn
                FROM pr WHERE cos < 0.35e0) WHERE rn = 1)
      SELECT p.anchor, p.cand AS pos_id, p.cos AS pos_cos,
             g.cand AS neg_id, g.cos AS neg_cos,
             floor((p.cos - g.cos) * 1e6 + 0.5) / 1e6 AS margin
      FROM pos p JOIN neg g USING (anchor) ORDER BY p.anchor"""
    })

  /** PSI DISTRIBUTION DRIFT — the population-stability index the
    * monitoring stack runs beside q192's KS test: events split into
    * first/second half by event id, values bucketed into 10 fixed bins
    * (clamped at the edges so no mass silently drops), Laplace-smoothed,
    * and PSI = Σ (pA−pB)·ln(pA/pB) folds order-pinned over the
    * bucket-sorted list per event type. The bucket-count relation is one
    * hash aggregate; the grid join keeps empty buckets in the sum
    * exactly as the smoothing requires.
    */
  val q310PsiDrift: QueryDef = QueryDef(
    "q310_psi_drift",
    (s, dir) => {
      import graft.functions.Det
      val ev = Tables.load(s, dir, "events")
      val mid = ev.agg(expr("(min(event_id) + max(event_id) + 1) div 2")
        .as("mid"))
      val e = ev.crossJoin(broadcast(mid))
        .select(col("event_type"), (col("event_id") < col("mid")).as("isa"),
          greatest(least(floor(col("value") / 50d), lit(9d)), lit(0d))
            .cast("int").as("b"))
      val cnt = e.groupBy("event_type", "b")
        .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isa"), 1L).otherwise(0L)).as("cb"))
      val grid = e.select("event_type").distinct()
        .select(col("event_type"), explode(sequence(lit(0), lit(9))).as("b"))
      val full = grid.join(cnt, Seq("event_type", "b"), "left")
        .na.fill(0L, Seq("ca", "cb"))
      full.groupBy("event_type")
        .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
          array_sort(collect_list(struct(col("b"), col("ca"), col("cb"))))
            .as("terms"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          Det.rdet(aggregate(col("terms"), lit(0.0d), (acc, x) => {
            val pa = (x("ca") + lit(1.0d)) / (col("n_a") + lit(10.0d))
            val pb = (x("cb") + lit(1.0d)) / (col("n_b") + lit(10.0d))
            acc + (pa - pb) * log(pa / pb)
          }), 6).as("psi"))
        .orderBy("event_type")
    },
    Some("""
      WITH m AS (SELECT (min(event_id) + max(event_id) + 1) // 2 AS mid
                 FROM events),
      e AS (SELECT event_type, event_id < mid AS isa,
                   CAST(greatest(least(floor(value / 50e0), 9), 0)
                     AS INTEGER) AS b
            FROM events CROSS JOIN m),
      cnt AS (SELECT event_type, b,
                     CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT)
                       AS ca,
                     CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT)
                       AS cb
              FROM e GROUP BY 1, 2),
      grid AS (SELECT DISTINCT event_type, u.b
               FROM e, unnest(range(0, 10)) AS u(b)),
      f AS (SELECT g.event_type, g.b,
                   COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
            FROM grid g LEFT JOIN cnt
              ON cnt.event_type = g.event_type AND cnt.b = g.b),
      t AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS n_a,
                   CAST(SUM(cb) AS BIGINT) AS n_b,
                   list([CAST(ca AS VARCHAR), CAST(cb AS VARCHAR)]
                        ORDER BY b) AS ts
            FROM f GROUP BY 1)
      SELECT event_type, n_a, n_b,
             floor(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(ts, x ->
                 ((CAST(x[1] AS DOUBLE) + 1) / (n_a + 10)
                   - (CAST(x[2] AS DOUBLE) + 1) / (n_b + 10))
                 * ln(((CAST(x[1] AS DOUBLE) + 1) / (n_a + 10))
                      / ((CAST(x[2] AS DOUBLE) + 1) / (n_b + 10))))),
               (acc, v) -> acc + v) * 1e6 + 0.5) / 1e6 AS psi
      FROM t ORDER BY event_type"""))

  /** QUALITY-FILTER CALIBRATION — before a pipeline trusts q30's quality
    * score as a filter, the calibration curve: documents ranked by the
    * ROUNDED score (distributed global rank, never a single-partition
    * window), cut into 10 equal-population deciles ascending, each
    * reporting its population, English share (the proxy label the score
    * is supposed to track), score bounds, and the integer-exact English
    * rate. A score that doesn't trend with the label across deciles is
    * not a filter.
    */
  val q311QualityCalibration: QueryDef = QueryDef(
    "q311_quality_calibration",
    (s, dir) => {
      import graft.operators.{Ranks, TextAnalysis}
      val docs = Tables.load(s, dir, "documents")
      val base = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"),
          floor(col("quality") * 1e6 + 0.5).cast("long").as("q_e6"))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      val nd = base.agg(count(lit(1)).as("nd"))
      Ranks.globalRowNumber(base.crossJoin(broadcast(nd)),
          Seq(col("q_e6"), col("doc_id")), "rn")
        .withColumn("decile", expr("((rn - 1) * 10) div nd") + 1)
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          min("q_e6").as("lo_e6"), max("q_e6").as("hi_e6"))
        .withColumn("en_rate_e6", expr("n_en * 1000000 div n"))
        .orderBy("decile")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, lang,
               CAST(floor((0.5e0 * stopword_ratio
                 + 0.3e0 * least(avg_token_len / 10.0e0, 1.0e0)
                 + 0.2e0 * least(CAST(n_tokens AS DOUBLE) / 100.0e0, 1.0e0))
                 * 1e6 + 0.5) AS BIGINT) AS q_e6
        FROM (SELECT doc_id, lang,
                     CAST(len(w) AS BIGINT) AS n_tokens,
                     (CAST(length(text) AS DOUBLE) - CAST(len(w) AS BIGINT)
                       + 1.0e0) / CAST(len(w) AS BIGINT) AS avg_token_len,
                     CAST(CAST(len(list_filter(w, t -> t IN
                       ('the', 'a', 'of', 'and', 'is'))) AS BIGINT)
                       AS DOUBLE) / CAST(len(w) AS BIGINT) AS stopword_ratio
              FROM (SELECT doc_id, lang, text,
                           string_split(text, ' ') AS w FROM documents))),
      t AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM base),
      rk AS (SELECT doc_id, lang, q_e6, nd,
                    row_number() OVER (ORDER BY q_e6, doc_id) AS rn
             FROM base CROSS JOIN t)
      SELECT ((rn - 1) * 10) // nd + 1 AS decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
             min(q_e6) AS lo_e6, max(q_e6) AS hi_e6,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               * 1000000 // CAST(count(*) AS BIGINT) AS en_rate_e6
      FROM rk GROUP BY 1 ORDER BY 1"""))

  /** ICEBERG PARTITION-SPEC EVOLUTION SCAN — the planner question after
    * an unpartitioned table evolves to bucketed: legacy spec-0 files
    * carry NO partition tuple, so the planner must scan them all
    * (residual filtering at read time) while still pruning the evolved
    * bucketed manifests by their truthful summaries. Per document a
    * three-manifest table is synthesized (m0 spec-0 with an EMPTY Avro
    * partition record, m1/m2 bucketed as in q285), planned through
    * [[graft.operators.IcebergManifests.planScan]] with the q285
    * never-resolve-a-pruned-manifest enforcement, and the oracle
    * recomputes the plan arithmetic — including that every legacy file
    * survives — in closed form.
    */
  val q312IcebergSpecEvolution: QueryDef = QueryDef(
    "q312_iceberg_spec_evolution",
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
        val bucketed = TRecord("r102", Vector("bucket" -> TInt))
        val legacy = TRecord("r102", Vector())
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          val k0 = 1 + r.n % 3
          val m0e = (0 until k0).map { i =>
            ManifestEntry(1, Some(8999L),
              DataFile(0, s"data/m0/f$i.parquet", "PARQUET",
                Vector(), 90L + (r.n + 5 * i) % 40,
                700L + (r.v + 9 * i) % 120))
          }
          val m0b = IcebergManifests.synthManifest(m0e, legacy, codec, r.v)
          val m0 = ManifestFile("meta/m0.avro", m0b.length.toLong, 0, 8999L,
            addedFiles = k0, existingFiles = 0, deletedFiles = 0,
            addedRows = m0e.map(_.dataFile.recordCount).sum,
            existingRows = 0L, deletedRows = 0L, partitions = None)
          val ms = (1 until 3).map { m =>
            val k = 2 + (r.n + m) % 3
            val entries = (0 until k).map { i =>
              ManifestEntry(1, Some(9000L + m),
                DataFile(0, s"data/m$m/f$i.parquet", "PARQUET",
                  Vector("bucket" -> (4L * m + (r.v + i) % 4)),
                  100L + (r.n + 7 * i + m) % 50,
                  1000L + (r.v * 3 + i * 11 + m * 17) % 500))
            }
            val bytes = IcebergManifests.synthManifest(entries, bucketed,
              codec, r.v + m)
            val buckets = entries.map(_.dataFile.partition.head._2)
            val mf = ManifestFile(s"meta/m$m.avro", bytes.length.toLong, 1,
              9000L + m,
              addedFiles = k, existingFiles = 0, deletedFiles = 0,
              addedRows = entries.map(_.dataFile.recordCount).sum,
              existingRows = 0L, deletedRows = 0L,
              partitions = Some(Vector(FieldSummary(containsNull = false,
                Some(buckets.min.toString), Some(buckets.max.toString)))))
            (mf, bytes)
          }
          val list = IcebergManifests.synthManifestList(
            m0 +: ms.map(_._1), codec, r.v + 7)
          val byPath = (("meta/m0.avro" -> m0b) +:
            ms.map(m => m._1.path -> m._2)).toMap
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
            plan.bytesMatched, k0,
            m0e.map(_.dataFile.recordCount).sum)
        }
      }
      probed.toDF("doc_id", "n_manifests", "manifests_pruned",
          "files_scanned", "files_matched", "rows_matched", "bytes_matched",
          "legacy_files", "legacy_rows")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, v % 10 AS lo, v % 10 + 2 AS hi,
                   1 + n % 3 AS k0 FROM d),
      pm AS (SELECT doc_id, lo, hi, u.m, 2 + (n + u.m) % 3 AS k, n, v
             FROM g, unnest([1, 2]) AS u(m)),
      pe AS (SELECT doc_id, m,
                    CASE WHEN hi < list_min(bkts) OR lo > list_max(bkts)
                         THEN 1 ELSE 0 END AS pruned,
                    k,
                    len(list_filter(range(k),
                      i -> bkts[i + 1] BETWEEN lo AND hi)) AS matched,
                    list_sum(list_transform(range(k), i ->
                      CASE WHEN bkts[i + 1] BETWEEN lo AND hi
                           THEN 100 + (n + 7 * i + m) % 50
                           ELSE 0 END)) AS mrows,
                    list_sum(list_transform(range(k), i ->
                      CASE WHEN bkts[i + 1] BETWEEN lo AND hi
                           THEN 1000 + (v * 3 + i * 11 + m * 17) % 500
                           ELSE 0 END)) AS mbytes
             FROM (SELECT *, list_transform(range(k),
                     i -> 4 * m + (v + i) % 4) AS bkts FROM pm)),
      pa AS (SELECT doc_id,
                    CAST(SUM(pruned) AS INTEGER) AS mp,
                    CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE k END)
                      AS INTEGER) AS fs,
                    CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE matched END)
                      AS INTEGER) AS fm,
                    CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE mrows END)
                      AS BIGINT) AS rm,
                    CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE mbytes END)
                      AS BIGINT) AS bm
             FROM pe GROUP BY 1),
      m0 AS (SELECT doc_id, k0,
                    CAST(list_sum(list_transform(range(k0),
                      i -> 90 + (n + 5 * i) % 40)) AS BIGINT) AS r0,
                    CAST(list_sum(list_transform(range(k0),
                      i -> 700 + (v + 9 * i) % 120)) AS BIGINT) AS b0
             FROM g)
      SELECT g.doc_id,
             CAST(3 AS INTEGER) AS n_manifests,
             pa.mp AS manifests_pruned,
             CAST(m0.k0 + pa.fs AS INTEGER) AS files_scanned,
             CAST(m0.k0 + pa.fm AS INTEGER) AS files_matched,
             m0.r0 + pa.rm AS rows_matched,
             m0.b0 + pa.bm AS bytes_matched,
             CAST(m0.k0 AS INTEGER) AS legacy_files,
             m0.r0 AS legacy_rows
      FROM g JOIN pa ON pa.doc_id = g.doc_id
             JOIN m0 ON m0.doc_id = g.doc_id
      ORDER BY g.doc_id"""))

  /** LABEL-NOISE AUDIT BY NEIGHBORHOOD VOTE — the embedding-space check
    * behind "are these labels trustworthy": for a deterministic query
    * sample (vec_id < 50), the majority label of the 5 exact nearest
    * neighbors versus the vector's own label; a consistent mismatch is
    * either a mislabel or a boundary point. Reuses
    * [[graft.operators.Similarity.topKBrute]] (queries broadcast; at
    * 100 TB the neighbor stage swaps to the ANN path unchanged) and
    * resolves the vote with one conditional max_by; ties break to the
    * smaller label.
    */
  val q313LabelNoiseAudit: QueryDef = QueryDef(
    "q313_label_noise_audit",
    (s, dir) => {
      import graft.operators.Similarity
      val e = Tables.load(s, dir, "embeddings")
      val labels = e.select(col("vec_id"), col("label"))
      val nn = Similarity.topKBrute(e, nQueries = 50, k = 5)
        .join(labels, "vec_id")
      val votes = nn.groupBy("q_id", "label")
        .agg(count(lit(1)).as("cnt"))
      votes.groupBy("q_id")
        .agg(max_by(col("label"), struct(col("cnt"), -col("label")))
          .as("top_label"))
        .join(labels.select(col("vec_id").as("q_id"),
          col("label").as("own_label")), "q_id")
        .select(col("q_id"), col("own_label"), col("top_label"),
          (col("top_label") =!= col("own_label")).as("suspect"))
        .orderBy("q_id")
    },
    Some {
      val cos = SimilarityQueries.rdet6(
        SimilarityQueries.cosSql("c.embedding", "q.embedding"))
      s"""
      WITH q AS (SELECT vec_id AS q_id, embedding, label AS own_label
                 FROM embeddings WHERE vec_id < 50),
      nn AS (SELECT q_id, vec_id, lbl FROM (
               SELECT q.q_id, c.vec_id, c.label AS lbl,
                      row_number() OVER (PARTITION BY q.q_id
                        ORDER BY $cos DESC, c.vec_id) AS rk
               FROM q, embeddings c WHERE c.vec_id <> q.q_id)
             WHERE rk <= 5),
      votes AS (SELECT q_id, lbl, count(*) AS cnt FROM nn GROUP BY 1, 2),
      top AS (SELECT q_id, lbl AS top_label FROM (
                SELECT q_id, lbl, row_number() OVER (PARTITION BY q_id
                  ORDER BY cnt DESC, lbl) AS rn FROM votes)
              WHERE rn = 1)
      SELECT q.q_id, q.own_label, top.top_label,
             top.top_label <> q.own_label AS suspect
      FROM q JOIN top ON top.q_id = q.q_id ORDER BY q.q_id"""
    })

  /** DELETION-REQUEST PROPAGATION — the right-to-be-forgotten
    * accounting a pipeline owes its DSAR process: for every user in the
    * deletion set (user_id ≡ 0 mod 7), the exact event footprint to
    * purge (count, type spread, first/last activity). Pure semi-join +
    * hash aggregate; the complementary anti-join is the actual purge
    * and shares the same shuffle key.
    */
  val q314DeletionPropagation: QueryDef = QueryDef(
    "q314_deletion_propagation",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("user_id") % 7 === 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("event_type")).as("n_types"),
          min("ts").as("first_ts"), max("ts").as("last_ts"),
          graft.functions.Det.dsum(col("value")).as("value_sum"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             min(ts) AS first_ts, max(ts) AS last_ts,
             CAST(floor(SUM(CAST((value) AS DECIMAL(30,8))) * 100)
               AS BIGINT) / 100.0e0 AS value_sum
      FROM events WHERE user_id % 7 = 0
      GROUP BY 1 ORDER BY 1"""))

  /** LSH BUCKET SKEW AUDIT — the shuffle-key question behind every
    * banded join at 100 TB: how skewed are the (band, key) buckets the
    * candidate join shuffles on, and how many candidate pairs does the
    * largest bucket alone contribute? Per band: bucket census, largest
    * bucket, the exact pair mass Σ s(s−1)/2, and the top bucket's share
    * — the measurement that decides whether the band join needs salting.
    * One hash aggregate over the banded relation; never materializes a
    * pair.
    */
  val q315LshSkewAudit: QueryDef = QueryDef(
    "q315_lsh_skew_audit",
    (s, dir) => {
      val banded = graft.operators.Dedup.bandedSignatures(
        Tables.load(s, dir, "documents"), shingleK = 3, rowsPerBand = 2)
      banded.groupBy("band", "key").agg(count(lit(1)).as("s"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_buckets"),
          sum("s").as("n_docs"),
          max("s").as("max_bucket"),
          sum(expr("s * (s - 1) div 2")).as("pair_mass"),
          max(expr("s * (s - 1) div 2")).as("max_bucket_pairs"))
        .withColumn("top_share_e6",
          expr("max_bucket * 1000000 div n_docs"))
        .orderBy("band")
    },
    Some {
      val sigList = (0 until 8).map(DedupQueries.sigExpr).mkString(", ")
      s"""
      WITH ${DedupQueries.shingleCtes},
      sg AS (SELECT doc_id, [$sigList] AS sgl FROM s),
      bk AS (SELECT doc_id, b,
                    sgl[2 * b + 1]::VARCHAR || '_' || sgl[2 * b + 2]::VARCHAR
                      AS key
             FROM sg, generate_series(0, 3) g(b)),
      bu AS (SELECT b AS band, key, CAST(count(*) AS BIGINT) AS s
             FROM bk GROUP BY 1, 2)
      SELECT CAST(band AS INTEGER) AS band,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(SUM(s) AS BIGINT) AS n_docs,
             CAST(max(s) AS BIGINT) AS max_bucket,
             CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS pair_mass,
             CAST(max(s * (s - 1) // 2) AS BIGINT) AS max_bucket_pairs,
             CAST(max(s) * 1000000 // SUM(s) AS BIGINT) AS top_share_e6
      FROM bu GROUP BY band ORDER BY band"""
    })

  /** TRAIN/TEST SPLIT-LEAKAGE AUDIT — the contamination check at the
    * SPLIT level: a 90/10 hash split is only honest if no near-duplicate
    * pair straddles it (a test doc whose near-twin trains is leakage the
    * doc-level dedup can't see). The verified near-dup pairs (banded
    * minhash candidates, exact shingle-Jaccard ≥ 0.5 — the q296
    * machinery) are classified by which sides of the split they touch;
    * `train-test` rows are the leaks. Band-bucket equi-join only — the
    * audit never compares docs across the split exhaustively.
    */
  val q316SplitLeakage: QueryDef = QueryDef(
    "q316_split_leakage",
    (s, dir) => {
      import graft.operators.{Dedup, ScopedCache}
      val docs = Tables.load(s, dir, "documents")
      val sp = docs.select(col("doc_id"),
          (pmod(graft.functions.HashFunctions.hash32(col("text")),
            lit(10)) === 0).as("is_test"))
        .transform(ScopedCache.cache)
      val banded = Dedup.bandedSignatures(docs, shingleK = 3, rowsPerBand = 2)
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sh = ScopedCache.cache(
        docs.filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"), Dedup.hashedShingles(col("text"), 3).as("sh")))
      val inter = graft.plans.SortedLongArrayIntersectCount(
        col("sh_a"), col("sh_b"))
      val jac = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (inter.cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - inter)).as("j"))
        .filter(col("j") >= 0.5d)
        .select(col("doc_a"), col("doc_b"),
          floor(col("j") * 1e6 + 0.5).cast("long").as("j_e6"))
      jac
        .join(sp.select(col("doc_id").as("doc_a"), col("is_test").as("ta")),
          "doc_a")
        .join(sp.select(col("doc_id").as("doc_b"), col("is_test").as("tb")),
          "doc_b")
        .select(
          when(col("ta") && col("tb"), "test-test")
            .when(!col("ta") && !col("tb"), "train-train")
            .otherwise("train-test").as("split_pair"),
          col("doc_a"), col("doc_b"), col("j_e6"))
        .groupBy("split_pair")
        .agg(count(lit(1)).as("n_pairs"),
          min("doc_a").as("min_doc_a"), max("doc_b").as("max_doc_b"),
          sum("j_e6").as("j_e6_sum"))
        .orderBy("split_pair")
    },
    Some {
      val sigList = (0 until 8).map(DedupQueries.sigExpr).mkString(", ")
      s"""
      WITH ${DedupQueries.shingleCtes},
      sg AS (SELECT doc_id, [$sigList] AS sgl,
                    list_distinct(list_transform(sh,
                      t -> ${DedupQueries.h32("t")})) AS hs
             FROM s),
      bands AS (SELECT doc_id, b,
                       sgl[2 * b + 1]::VARCHAR || '_' ||
                         sgl[2 * b + 2]::VARCHAR AS key
                FROM sg, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
      jac AS (SELECT doc_a, doc_b,
                     CAST(floor(j * 1e6 + 0.5) AS BIGINT) AS j_e6
              FROM (SELECT c.doc_a, c.doc_b,
                           CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                             / (len(sa.hs) + len(sb.hs)
                                - len(list_intersect(sa.hs, sb.hs))) AS j
                    FROM cand c JOIN sg sa ON sa.doc_id = c.doc_a
                                JOIN sg sb ON sb.doc_id = c.doc_b)
              WHERE j >= 0.5e0),
      sp AS (SELECT doc_id,
                    ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 = 0
                      AS is_test
             FROM documents)
      SELECT CASE WHEN ta.is_test AND tb.is_test THEN 'test-test'
                  WHEN NOT ta.is_test AND NOT tb.is_test THEN 'train-train'
                  ELSE 'train-test' END AS split_pair,
             CAST(count(*) AS BIGINT) AS n_pairs,
             min(doc_a) AS min_doc_a, max(doc_b) AS max_doc_b,
             CAST(SUM(j_e6) AS BIGINT) AS j_e6_sum
      FROM jac JOIN sp ta ON ta.doc_id = jac.doc_a
               JOIN sp tb ON tb.doc_id = jac.doc_b
      GROUP BY 1 ORDER BY 1"""
    })

  /** CRAWL-FRONTIER FUNNEL — the politeness + canonicalization
    * composition a crawler runs before fetching: per document a real
    * robots policy ([[graft.operators.RobotsTxt]], the q268 shape) and
    * four synthetic URLs exercising the canonicalization traps (www +
    * case host, utm params, default port, trailing slash, fragment);
    * the frontier keeps robots-allowed URLs and dedups them by
    * [[graft.operators.TextAnalysis.canonicalizeUrl]] — two URLs that
    * differ only in tracking params must fetch once. The robots walk is
    * per-row Scala over a Dataset; the canonical dedup is a codegen'd
    * expression + hash aggregate.
    */
  val q317CrawlFrontier: QueryDef = QueryDef(
    "q317_crawl_frontier",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val urls = src.flatMap { r =>
        import graft.operators.RobotsTxt
        val c = ('a' + r.v % 26).toChar
        val hasBot = r.v % 2 == 0
        val txt = "User-agent: *\nDisallow: /tmp/\nAllow: /tmp/pub\n" +
          (if (hasBot) "\nUser-agent: graftbot\nDisallow:\n" else "")
        val robots = RobotsTxt.parse(txt)
        val us = Seq(
          s"https://WWW.Ex$c.org/a/${r.n % 10}/",
          s"https://ex$c.org/a/${r.n % 10}?utm_source=x",
          s"http://ex$c.org:80/tmp/data${r.n % 10}",
          s"https://ex$c.org/tmp/pub/x#frag")
        us.map { u =>
          val path = u.replaceFirst("(?i)^[a-z]+://[^/]+", "") match {
            case "" => "/"
            case p => p
          }
          (r.doc_id, u, RobotsTxt.isAllowed(robots, "graftbot", path))
        }
      }.toDF("doc_id", "url", "allowed")
      urls
        .withColumn("cu",
          graft.operators.TextAnalysis.canonicalizeUrl(col("url")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_urls"),
          sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
          count_distinct(when(col("allowed"), col("cu"))).as("n_canonical"),
          min(when(col("allowed"), col("cu"))).as("first_canonical"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n % 10 AS p, chr(97 + v % 26) AS c,
                   v % 2 = 0 AS hasbot
            FROM d)
      SELECT doc_id,
             CAST(4 AS BIGINT) AS n_urls,
             CAST(CASE WHEN hasbot THEN 4 ELSE 3 END AS BIGINT) AS n_allowed,
             CAST(CASE WHEN hasbot THEN 3 ELSE 2 END AS BIGINT)
               AS n_canonical,
             CASE WHEN hasbot
                  THEN 'http://ex' || c || '.org/tmp/data' || p
                  ELSE 'https://ex' || c || '.org/a/' || p
             END AS first_canonical
      FROM g ORDER BY doc_id"""))

  /** ICEBERG REFS: BRANCHES AND TAGS — the v2 `refs` map that makes
    * time travel and WAP workflows addressable: per document a metadata
    * doc carries `main` (tied by spec to current-snapshot-id), a `v1`
    * TAG bookmarking the first snapshot, and (on even hashes) a `dev`
    * branch mid-history with its retention knobs. ONLY the tag's
    * manifest chain is materialized — resolving any other snapshot
    * fails loudly, so the row proves the reader descended through the
    * ref, not through current. Parse-level strictness (ref type legal,
    * target listed, main agrees with current, min-snapshots-to-keep
    * branch-only) is enforced in [[graft.operators.IcebergMetadata]].
    */
  val q318IcebergRefs: QueryDef = QueryDef(
    "q318_iceberg_refs",
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
        import graft.operators.{IcebergManifests, IcebergMetadata}
        import graft.operators.IcebergManifests._
        import graft.operators.IcebergMetadata.{NamedRef, SnapshotRef}
        val partType = TRecord("r102", Vector("bucket" -> TInt))
        rows.map { r =>
          val nSnaps = 2 + r.v % 3
          val cur = nSnaps - 1
          // the TAG snapshot (first in history) is the only one whose
          // chain exists; main/dev lists resolve to nothing
          val k = 2 + r.n % 4
          val entries = (0 until k).map { i =>
            ManifestEntry(1, None,
              DataFile(0, s"s0/f$i.parquet", "PARQUET",
                Vector("bucket" -> ((r.v + i) % 4).toLong),
                30L + (r.v + i) % 40,
                1000L + (r.n * 3 + i * 7) % 400))
          }
          val dm = synthManifest(entries, partType, "deflate",
            (r.v % 80) + 1)
          val list = synthManifestList(Seq(
            ManifestFile("meta/m0.avro", dm.length.toLong, 0, 1000L,
              k, 0, 0, entries.map(_.dataFile.recordCount).sum,
              0L, 0L, None, 0)),
            "deflate", (r.n % 80) + 2)
          val snaps = (0 until nSnaps).map(si =>
            SnapshotRef(1000L + si, si + 1L,
              1700000000000L + si * 1000L, s"meta/list$si.avro",
              if (si == 0) "append" else "overwrite"))
          val hasDev = r.v % 2 == 0
          val devAt = cur / 2
          val refs = Seq(
            NamedRef("main", 1000L + cur, isBranch = true),
            NamedRef("v1", 1000L, isBranch = false,
              maxRefAgeMs = Some(86400000L))) ++
            (if (hasDev)
              Seq(NamedRef("dev", 1000L + devAt, isBranch = true,
                minSnapshotsToKeep = Some(3)))
            else Nil)
          val json = IcebergMetadata.synthMetadata(
            s"tbl-${r.v}", s"warehouse/t${r.doc_id}", snaps,
            1000L + cur, refs = refs)
          val meta = IcebergMetadata.parseMetadata(json)
            .getOrElse(sys.error(s"metadata parse failed: doc ${r.doc_id}"))
          val tag = meta.snapshotFor("v1")
            .getOrElse(sys.error(s"tag unresolvable: doc ${r.doc_id}"))
          val lookup = Map("meta/list0.avro" -> list, "meta/m0.avro" -> dm)
          val st = IcebergManifests.replayV2(
              lookup.getOrElse(tag.manifestList,
                sys.error(s"tag resolved wrong list: doc ${r.doc_id}")),
              lookup.get)
            .getOrElse(sys.error(s"tag replay failed: doc ${r.doc_id}"))
          val devBehind = meta.ref("dev")
            .map(d => (cur + 1L) - meta.snapshotFor("dev").get.sequenceNumber)
            .getOrElse(-1L)
          (r.doc_id, meta.refs.size, meta.refs.count(_.isBranch),
            meta.refs.count(!_.isBranch), tag.id, tag.sequenceNumber,
            meta.ref("v1").flatMap(_.maxRefAgeMs).getOrElse(-1L),
            devBehind, st.base.live.size, st.base.liveRows)
        }
      }
      probed.toDF("doc_id", "n_refs", "n_branches", "n_tags",
          "tag_snapshot", "tag_seq", "tag_max_age_ms", "dev_behind",
          "tag_live_files", "tag_live_rows")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, (2 + v % 3) - 1 AS cur,
                   2 + n % 4 AS k, v % 2 = 0 AS hasdev
            FROM d)
      SELECT doc_id,
             CAST(CASE WHEN hasdev THEN 3 ELSE 2 END AS INTEGER) AS n_refs,
             CAST(CASE WHEN hasdev THEN 2 ELSE 1 END AS INTEGER)
               AS n_branches,
             CAST(1 AS INTEGER) AS n_tags,
             CAST(1000 AS BIGINT) AS tag_snapshot,
             CAST(1 AS BIGINT) AS tag_seq,
             CAST(86400000 AS BIGINT) AS tag_max_age_ms,
             CAST(CASE WHEN hasdev THEN (cur + 1) - (cur // 2 + 1)
                  ELSE -1 END AS BIGINT) AS dev_behind,
             CAST(k AS INTEGER) AS tag_live_files,
             CAST(list_sum(list_transform(range(k),
               i -> 30 + (v + i) % 40)) AS BIGINT) AS tag_live_rows
      FROM g ORDER BY doc_id"""))

  /** DELTA PROTOCOL + METADATA GATE
    * ([[graft.operators.DeltaReplay.tableInfo]]): the version gate a
    * client must check before trusting the log, and the table
    * id/schema/partitioning, both last-writer-wins. Per document a
    * synthetic log carries a protocol (reader 1 or 2 — the 2s report
    * `reader_supported = false` rather than a fabricated read), an
    * initial metaData, and on every fourth hash a LATER metaData that
    * adds a schema field and renames the table id — the last-wins fold
    * must surface the update. Schema field counts come from the
    * JSON-serialized schemaString both engines count identically.
    */
  val q319DeltaProtocol: QueryDef = QueryDef(
    "q319_delta_protocol",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
      def schemaJson(k: org.apache.spark.sql.Column) = concat(
        lit("""{\"type\":\"struct\",\"fields\":["""),
        array_join(transform(sequence(lit(0), k - 1),
          i => concat(lit("""{\"name\":\"c"""), i, lit("""\"}"""))), ","),
        lit("]}"))
      val protocol = d.select(col("doc_id"), lit(0L).as("version"),
        format_string(
          """{"protocol":{"minReaderVersion":%d,"minWriterVersion":%d}}""",
          lit(1) + col("v") % 2, lit(2) + col("v") % 3).as("line"))
      val meta0 = d.select(col("doc_id"), lit(0L).as("version"),
        format_string(
          """{"metaData":{"id":"m-%d","schemaString":"%s","partitionColumns":%s}}""",
          col("doc_id"), schemaJson((lit(2) + col("n") % 3).cast("int")),
          when(col("v") % 3 === 0, """["lang","source"]""")
            .when(col("v") % 3 === 1, """["lang"]""")
            .otherwise("[]")).as("line"))
      val meta1 = d.filter(col("v") % 4 === 0)
        .select(col("doc_id"), lit(3L).as("version"),
          format_string(
            """{"metaData":{"id":"m2-%d","schemaString":"%s","partitionColumns":[]}}""",
            col("doc_id"), schemaJson((lit(3) + col("n") % 3).cast("int")))
            .as("line"))
      val adds = d.select(col("doc_id"), lit(1L).as("version"),
        format_string(
          """{"add":{"path":"part-%d","size":%d,"dataChange":true}}""",
          col("doc_id"), col("n")).as("line"))
      val log = protocol.unionAll(meta0).unionAll(meta1).unionAll(adds)
      graft.operators.DeltaReplay.tableInfo(log, groupCols = Seq("doc_id"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS INTEGER) AS v
                 FROM documents)
      SELECT doc_id,
             CAST(1 + v % 2 AS INTEGER) AS min_reader,
             CAST(2 + v % 3 AS INTEGER) AS min_writer,
             v % 2 = 0 AS reader_supported,
             CASE WHEN v % 4 = 0 THEN 'm2-' || doc_id
                  ELSE 'm-' || doc_id END AS meta_id,
             CAST(CASE WHEN v % 4 = 0 THEN 3 + n % 3
                  ELSE 2 + n % 3 END AS INTEGER) AS n_schema_fields,
             CAST(CASE WHEN v % 4 = 0 THEN 0
                  WHEN v % 3 = 0 THEN 2
                  WHEN v % 3 = 1 THEN 1
                  ELSE 0 END AS INTEGER) AS n_part_cols,
             CASE WHEN v % 4 = 0 THEN NULL
                  WHEN v % 3 IN (0, 1) THEN 'lang'
                  ELSE NULL END AS first_part_col
      FROM d ORDER BY doc_id"""))

  /** PADDING-WASTE BATCHING AUDIT — the inference/training-serving
    * question behind length-bucketed dynamic batching: documents
    * batched 32 at a time pay `max_len − len` padding per row, and the
    * audit measures total padding under three bucketing grains (one
    * global bucket, width-64, width-16 token buckets) — the measured
    * S-curve behind choosing the bucket width. Within-bucket order and
    * batch assignment use [[graft.operators.Ranks.groupedRowNumber]]
    * (few giant groups — exactly the case a plain partitioned window
    * degenerates on); everything else is hash aggregates.
    */
  val q320PaddingWaste: QueryDef = QueryDef(
    "q320_padding_waste",
    (s, dir) => {
      import graft.operators.{Ranks, ScopedCache}
      val toks = ScopedCache.cache(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("tok")))
      Seq(100000, 64, 16).map { w =>
        val b = toks.withColumn("bkt", expr(s"tok div $w"))
        val ranked = Ranks.groupedRowNumber(b, Seq(col("bkt")),
          Seq(col("tok"), col("doc_id")), "rn")
        ranked.withColumn("batch", expr("(rn - 1) div 32"))
          .groupBy("bkt", "batch")
          .agg(count(lit(1)).as("bn"), max("tok").as("mx"),
            sum("tok").as("ts"))
          .agg(count(lit(1)).as("n_batches"),
            sum("bn").as("n_docs"),
            sum("ts").as("token_sum"),
            sum(col("mx") * col("bn") - col("ts")).as("padding_sum"))
          .select(lit(w).as("bucket_w"), col("n_docs"), col("n_batches"),
            col("token_sum"), col("padding_sum"),
            expr("padding_sum * 1000000 div (padding_sum + token_sum)")
              .as("waste_e6"))
      }.reduce(_ unionAll _).orderBy("bucket_w")
    },
    Some("""
      WITH t AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                 FROM documents),
      cfg AS (SELECT unnest([100000, 64, 16]) AS w),
      r AS (SELECT w, doc_id, tok, tok // w AS bkt,
                   row_number() OVER (PARTITION BY w, tok // w
                     ORDER BY tok, doc_id) AS rn
            FROM t CROSS JOIN cfg),
      b AS (SELECT w, bkt, (rn - 1) // 32 AS batch,
                   CAST(count(*) AS BIGINT) AS bn,
                   max(tok) AS mx, CAST(SUM(tok) AS BIGINT) AS ts
            FROM r GROUP BY 1, 2, 3)
      SELECT CAST(w AS INTEGER) AS bucket_w,
             CAST(SUM(bn) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_batches,
             CAST(SUM(ts) AS BIGINT) AS token_sum,
             CAST(SUM(mx * bn - ts) AS BIGINT) AS padding_sum,
             CAST(SUM(mx * bn - ts) * 1000000
               // (SUM(mx * bn - ts) + SUM(ts)) AS BIGINT) AS waste_e6
      FROM b GROUP BY 1 ORDER BY 1"""))

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the mergeable-aggregate
    * discipline behind every incremental pipeline: yesterday's view (the
    * base partition) and today's delta are aggregated SEPARATELY and
    * merged by re-aggregating the partials (count/sum add, min/max fold)
    * — never by recomputing over the union of raw rows. The oracle
    * computes the view directly from the full table, so the query IS the
    * proof that merge(partials) == recompute(all): any non-mergeable
    * aggregate smuggled into the view lands in the hash. At 100 TB the
    * base partials are a tiny table and only the delta touches raw data.
    */
  val q321IncrementalView: QueryDef = QueryDef(
    "q321_incremental_view",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          (pmod(graft.functions.HashFunctions.hash32(col("text")),
            lit(5)) === 0).as("is_delta"))
      def partial(part: org.apache.spark.sql.DataFrame) =
        part.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("tok_sum"),
            max("n_chars").as("max_chars"), min("doc_id").as("min_doc"))
      val base = partial(docs.filter(!col("is_delta")))
      val delta = partial(docs.filter(col("is_delta")))
      base.unionAll(delta)
        .groupBy("source")
        .agg(sum("n_docs").as("n_docs"), sum("tok_sum").as("tok_sum"),
          max("max_chars").as("max_chars"), min("min_doc").as("min_doc"))
        .orderBy("source")
    },
    Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_sum,
             max(n_chars) AS max_chars, min(doc_id) AS min_doc
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** ICEBERG V2 EQUALITY DELETES — the second merge-on-read delete
    * flavor beside q279's positional: an equality-delete file carries
    * COLUMN VALUES (real Avro rows under the field-135 `equality_ids`
    * contract), and matching data rows disappear at scan time. Per
    * document a table with a data manifest, a positional delete file,
    * and 1-2 equality-delete files replays through
    * [[graft.operators.IcebergManifests.replayV2]], which enforces the
    * new rules (equality entries must set non-empty equality_ids,
    * positional must not, data files never carry it, equality files'
    * row counts and byte lengths are verified against their Avro
    * content) and reports the honest arithmetic: positional
    * `effectiveRows` plus the equality residual's pessimistic
    * `minEffectiveRows` floor — never a guessed match count.
    */
  val q322IcebergEqualityDeletes: QueryDef = QueryDef(
    "q322_iceberg_equality_deletes",
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
          val k = 2 + r.n % 3
          val dataEntries = (0 until k).map { i =>
            ManifestEntry(1, Some(9001L),
              DataFile(0, s"data/f$i.parquet", "PARQUET",
                Vector("bucket" -> (i % 4).toLong),
                20L + (r.n + 3 * i) % 30,
                500L + (r.v + 5 * i) % 200))
          }
          val dm = IcebergManifests.synthManifest(dataEntries, partType,
            codec, r.v)
          // one positional file deleting p positions from f0
          val p = 1 + r.v % 3 // < 20 <= f0's record_count
          val pos = IcebergManifests.synthPosDeletes(
            (0 until p).map(i => ("data/f0.parquet", i.toLong)),
            codec, r.v + 1)
          // 1-2 equality files on column id 2 (doc_id)
          val ne = 1 + r.n % 2
          val eqs = (0 until ne).map { e =>
            val nv = 2 + (r.v + e) % 4
            IcebergManifests.synthEqDeletes("doc_id",
              (0 until nv).map(i => (r.doc_id * 10 + e * 100 + i)),
              codec, r.v + 2 + e)
          }
          def delEntry(c: Int, path: String, b: Array[Byte], rc: Long,
              ids: Option[Vector[Int]]) =
            ManifestEntry(1, Some(9002L), DataFile(c, path, "AVRO",
              Vector("bucket" -> 0L), rc, b.length.toLong, ids))
          val delEntries = delEntry(1, "del/p0.avro", pos, p.toLong,
            None) +: eqs.zipWithIndex.map { case (b, e) =>
            delEntry(2, s"del/e$e.avro", b,
              (2 + (r.v + e) % 4).toLong, Some(Vector(2)))
          }
          val em = IcebergManifests.synthManifest(delEntries, partType,
            codec, r.v + 9)
          def mf(path: String, bytes: Array[Byte],
              es: Seq[ManifestEntry], content: Int) = {
            def c(st: Int) = es.count(_.status == st)
            def rc(st: Int) =
              es.filter(_.status == st).map(_.dataFile.recordCount).sum
            ManifestFile(path, bytes.length.toLong, 0, 9001L,
              c(1), c(0), c(2), rc(1), rc(0), rc(2), None, content)
          }
          val list = IcebergManifests.synthManifestList(
            Seq(mf("meta/dm.avro", dm, dataEntries, 0),
              mf("meta/em.avro", em, delEntries, 1)), codec, r.v + 11)
          val byPath = Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
            "del/p0.avro" -> pos) ++
            eqs.zipWithIndex.map { case (b, e) => s"del/e$e.avro" -> b }
          val st = IcebergManifests.replayV2(list, byPath.get)
            .getOrElse(sys.error(s"v2 replay failed: doc ${r.doc_id}"))
          (r.doc_id, codec, st.base.live.size, st.base.liveRows,
            st.deletedPositions.values.sum, st.effectiveRows,
            st.eqDeletes.size, st.eqDeleteRows, st.minEffectiveRows,
            st.eqDeletes.map(_.equalityIds.get.mkString(",")).distinct
              .mkString(";"))
        }
      }
      probed.toDF("doc_id", "codec", "n_live", "live_rows", "pos_deleted",
          "effective_rows", "n_eq_files", "eq_delete_rows",
          "min_effective_rows", "eq_ids")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 2 + n % 3 AS k, 1 + v % 3 AS p,
                   1 + n % 2 AS ne
            FROM d),
      u AS (SELECT *,
                   list_sum(list_transform(range(k),
                     i -> 20 + (n + 3 * i) % 30)) AS liverows,
                   list_sum(list_transform(range(ne),
                     e -> 2 + (v + e) % 4)) AS eqrows
            FROM g)
      SELECT doc_id,
             (['null', 'deflate', 'snappy'])[v % 3 + 1] AS codec,
             CAST(k AS INTEGER) AS n_live,
             CAST(liverows AS BIGINT) AS live_rows,
             CAST(p AS BIGINT) AS pos_deleted,
             CAST(liverows - p AS BIGINT) AS effective_rows,
             CAST(ne AS INTEGER) AS n_eq_files,
             CAST(eqrows AS BIGINT) AS eq_delete_rows,
             CAST(greatest(liverows - p - eqrows, 0) AS BIGINT)
               AS min_effective_rows,
             '2' AS eq_ids
      FROM u ORDER BY doc_id"""))

  /** CLICK ATTRIBUTION WITH MISSES — the batch twin of
    * [[graft.streaming.EventsStreaming.clickPurchaseJoinOuter]] (the
    * round's new LEFT OUTER stream-stream join), anchored in the hash
    * gate: every click pairs with the same user's LATEST purchase in the
    * preceding hour, or null-pads. The outer join blocks on user — never
    * clicks × purchases — and the latest-in-window pick is one
    * conditional max_by, not a window.
    */
  val q323ClickAttribution: QueryDef = QueryDef(
    "q323_click_attribution",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event"), col("user_id"),
          col("ts").as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event"), col("user_id"),
          col("ts").as("p_ts"))
      val inWindow =
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
          col("p_ts") <= col("c_ts")
      c.join(p, Seq("user_id"), "left")
        .groupBy("c_event", "user_id", "c_ts")
        // lexicographic struct max = latest purchase, ties to the larger
        // event id — deterministic in both engines (DuckDB's max_by
        // rejects struct keys; plain max over a struct compares fine)
        .agg(max(when(inWindow, struct(col("p_ts"), col("p_event"))))
          .as("m"))
        .select(col("c_event"), col("user_id"), col("c_ts"),
          col("m.p_event").as("attributed"),
          col("m.p_ts").as("attributed_ts"),
          col("m").isNotNull.as("converted"))
        .orderBy("c_event")
    },
    Some("""
      WITH c AS (SELECT event_id AS c_event, user_id, ts AS c_ts
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT event_id AS p_event, user_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase')
      SELECT c_event, user_id, c_ts,
             (max(CASE WHEN p_ts >= c_ts - INTERVAL 1 HOUR
                        AND p_ts <= c_ts
                   THEN struct_pack(p_ts := p_ts, p_event := p_event)
                   END)).p_event AS attributed,
             (max(CASE WHEN p_ts >= c_ts - INTERVAL 1 HOUR
                        AND p_ts <= c_ts
                   THEN struct_pack(p_ts := p_ts, p_event := p_event)
                   END)).p_ts AS attributed_ts,
             max(CASE WHEN p_ts >= c_ts - INTERVAL 1 HOUR
                       AND p_ts <= c_ts THEN p_ts END) IS NOT NULL
               AS converted
      FROM c LEFT JOIN p USING (user_id)
      GROUP BY 1, 2, 3 ORDER BY c_event"""))

  /** WATERMARK LATENESS BUDGET — the drop-rate question behind choosing
    * a watermark delay: modeling each user's feed in arrival order
    * (event id), an event is LATE at budget L when it lags the user's
    * running event-time high-water mark by more than L. Measured at
    * 1/10/60-minute budgets — the S-curve that prices lateness tolerance
    * in state size. Running max is a per-user window (many small
    * partitions); the rest is one aggregate per budget.
    */
  val q324LatenessBudget: QueryDef = QueryDef(
    "q324_lateness_budget",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val lagged = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("tsec"))
        .withColumn("hwm", max("tsec").over(w))
        .withColumn("lag_s",
          when(col("hwm").isNull, 0L)
            .otherwise(greatest(col("hwm") - col("tsec"), lit(0L))))
        .transform(graft.operators.ScopedCache.cache)
      Seq(60L, 600L, 3600L).map { budget =>
        lagged.agg(
          count(lit(1)).as("n_events"),
          sum(when(col("lag_s") > budget, 1L).otherwise(0L)).as("n_late"),
          coalesce(max(when(col("lag_s") > budget, col("lag_s"))), lit(0L))
            .as("max_late_s"))
          .select(lit(budget).as("budget_s"), col("n_events"),
            col("n_late"),
            expr("n_late * 1000000 div n_events").as("late_e6"),
            col("max_late_s"))
      }.reduce(_ unionAll _).orderBy("budget_s")
    },
    Some("""
      WITH l AS (SELECT user_id, event_id,
                        CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
                        max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                          PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS hwm
                 FROM events),
      g AS (SELECT CASE WHEN hwm IS NULL THEN 0
                        ELSE greatest(hwm - tsec, 0) END AS lag_s
            FROM l),
      cfg AS (SELECT unnest([60, 600, 3600]) AS budget_s)
      SELECT CAST(budget_s AS BIGINT) AS budget_s,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN lag_s > budget_s THEN 1 ELSE 0 END)
               AS BIGINT) AS n_late,
             CAST(SUM(CASE WHEN lag_s > budget_s THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS late_e6,
             CAST(COALESCE(max(CASE WHEN lag_s > budget_s THEN lag_s END),
               0) AS BIGINT) AS max_late_s
      FROM g CROSS JOIN cfg GROUP BY 1 ORDER BY 1"""))

  /** HLL PRECISION S-CURVE — the state-vs-accuracy audit behind choosing
    * a sketch precision (the q296/q301 protocol applied to q141's HLL):
    * the SAME hash pass registers at p = 4/6/8 (16/64/256 registers),
    * each estimating the lineitem part-key distinct count with the
    * standard alpha constants and the LINEAR-COUNTING small-range branch
    * (both engines take the identical branch — at small SFs the 256-
    * register estimate IS in linear-counting range, so the branch is
    * load-bearing, not decorative), and the measured relative error per
    * precision is the audit. One hash pass, per-precision register
    * tables of at most 256 rows.
    */
  val q325HllPrecisionAudit: QueryDef = QueryDef(
    "q325_hll_precision_audit",
    (s, dir) => {
      import graft.functions.{Det, HashFunctions}
      val li = Tables.load(s, dir, "lineitem")
      val h = li.select(HashFunctions.hash32(
          concat(lit("pk"), col("l_partkey").cast("string"))).as("hv"))
        .transform(graft.operators.ScopedCache.cache)
      val exact = li.agg(count_distinct(col("l_partkey")).as("n_exact"))
      Seq(4, 6, 8).map { p =>
        val m = 1 << p
        val bits = 32 - p
        val reg = h.select(pmod(col("hv"), lit(m.toLong)).as("idx"),
            shiftright(col("hv"), p).as("w"))
          .select(col("idx"),
            when(col("w") === 0, lit(bits + 1))
              .otherwise(lit(bits + 1) - length(bin(col("w"))))
              .as("rho"))
          .groupBy("idx").agg(max("rho").as("mreg"))
        val alpha =
          if (p == 4) 0.673d
          else if (p == 6) 0.709d
          else 0.7213d / (1d + 1.079d / 256d)
        reg.agg(count(lit(1)).as("nreg"),
            sum(lit(1.0d) /
              call_function("shiftleft", lit(1L), col("mreg").cast("int"))
                .cast("double")).as("sreg"))
          .select(
            (lit(alpha) * m * m /
              (col("sreg") + (lit(m.toLong) - col("nreg")).cast("double")))
              .as("raw"),
            (lit(m.toLong) - col("nreg")).as("zeros"))
          .select(when(
              col("raw") <= lit(2.5d * m) && col("zeros") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) /
                col("zeros").cast("double")))
            .otherwise(col("raw")).as("estd"))
          .crossJoin(broadcast(exact))
          .select(lit(p).as("p"), lit(m).as("m"), col("n_exact"),
            Det.rdet(col("estd"), 2).as("est_hll"),
            floor(abs(Det.rdet(col("estd"), 2) - col("n_exact")) /
              col("n_exact") * 1e6 + 0.5).cast("long").as("err_e6"))
      }.reduce(_ unionAll _).orderBy("p")
    },
    Some {
      def h32 = Round5Queries.h32Sql("('pk' || CAST(l_partkey AS VARCHAR))")
      def cte(p: Int): String = {
        val m = 1 << p
        val bits = 32 - p
        val alpha =
          if (p == 4) "0.673e0"
          else if (p == 6) "0.709e0"
          else "(0.7213e0 / (1e0 + 1.079e0 / 256e0))"
        s"""reg_$p AS (SELECT hv % $m AS idx,
           |  max(CASE WHEN hv // $m = 0 THEN ${bits + 1}
           |           ELSE ${bits + 1} - length(bin(hv // $m)) END) AS mreg
           |  FROM h GROUP BY 1),
           |e_$p AS (SELECT count(*) AS nreg,
           |  SUM(1e0 / CAST(CAST(1 AS BIGINT) << mreg AS DOUBLE)) AS sreg
           |  FROM reg_$p),
           |r_$p AS (SELECT $alpha * $m * $m
           |    / (sreg + CAST($m - nreg AS DOUBLE)) AS raw,
           |    $m - nreg AS zeros FROM e_$p),
           |v_$p AS (SELECT CASE WHEN raw <= ${2.5 * m}e0 AND zeros > 0
           |    THEN ${m}e0 * ln(${m}e0 / CAST(zeros AS DOUBLE))
           |    ELSE raw END AS estd FROM r_$p)"""
          .stripMargin.replace("\n", " ")
      }
      def row(p: Int): String =
        s"""SELECT CAST($p AS INTEGER) AS p, CAST(${1 << p} AS INTEGER) AS m,
           |  n_exact,
           |  floor(estd * 1e2 + 0.5) / 1e2 AS est_hll,
           |  CAST(floor(abs(floor(estd * 1e2 + 0.5) / 1e2 - n_exact)
           |    / n_exact * 1e6 + 0.5) AS BIGINT) AS err_e6
           |FROM v_$p CROSS JOIN x""".stripMargin.replace("\n", " ")
      s"""
      WITH h AS (SELECT $h32 AS hv FROM lineitem),
      x AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
            FROM lineitem),
      ${cte(4)}, ${cte(6)}, ${cte(8)}
      ${row(4)} UNION ALL ${row(6)} UNION ALL ${row(8)}
      ORDER BY p"""
    })

  /** DEDUP SURVIVOR POLICY WITH PROVENANCE — the final act of near-dup
    * dedup: per connected-component cluster (q58's labels), WHICH copy
    * survives and what got dropped. The standard longest-document-wins
    * rule (ties to the smaller id) picks the survivor via one
    * conditional max_by; the accounting (members, dropped docs/bytes)
    * is the provenance record a curation pipeline keeps so deletions
    * are auditable. The oracle shares q58's recursive-CTE clustering
    * through one builder, so policy and clustering can never drift.
    */
  val q326DedupSurvivors: QueryDef = QueryDef(
    "q326_dedup_survivors",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val clusters = graft.operators.Dedup.dedupClusters(
        docs, shingleK = 3, rowsPerBand = 2, threshold = 0.5)
      clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          max_by(struct(col("doc_id"), col("n_chars")),
            struct(col("n_chars"), -col("doc_id"))).as("sv"),
          sum("n_chars").as("total_chars"))
        .select(col("cluster_id"), col("n_members"),
          col("sv.doc_id").as("survivor_doc"),
          col("sv.n_chars").as("survivor_chars"),
          (col("n_members") - 1).as("n_dropped"),
          (col("total_chars") - col("sv.n_chars")).as("dropped_chars"))
        .orderBy("cluster_id")
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.clusterCtes},
      lab AS (SELECT doc_id, CAST(min(root) AS BIGINT) AS cluster_id
              FROM reach GROUP BY doc_id),
      m AS (SELECT lab.cluster_id, lab.doc_id, d.n_chars
            FROM lab JOIN documents d ON d.doc_id = lab.doc_id),
      sv AS (SELECT cluster_id, doc_id AS survivor_doc,
                    n_chars AS survivor_chars
             FROM (SELECT cluster_id, doc_id, n_chars,
                          row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn
                   FROM m) WHERE rn = 1)
      SELECT m.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             min(sv.survivor_doc) AS survivor_doc,
             min(sv.survivor_chars) AS survivor_chars,
             CAST(count(*) - 1 AS BIGINT) AS n_dropped,
             CAST(SUM(m.n_chars) - min(sv.survivor_chars) AS BIGINT)
               AS dropped_chars
      FROM m JOIN sv ON sv.cluster_id = m.cluster_id
      GROUP BY m.cluster_id ORDER BY m.cluster_id"""))

  val all: Seq[QueryDef] = Seq(q297PackBpeBudget, q298CurriculumStages,
    q299MemorizationGrams, q300IcebergExpiry, q301PqRerankRecall,
    q302BlockDedup, q303TemperatureMix, q304KAnonymity, q305DeltaVacuum,
    q306GroupAdvantage, q307SlidingChunks, q308MixtureBudget,
    q309ContrastiveMining, q310PsiDrift, q311QualityCalibration,
    q312IcebergSpecEvolution, q313LabelNoiseAudit, q314DeletionPropagation,
    q315LshSkewAudit, q316SplitLeakage, q317CrawlFrontier,
    q318IcebergRefs, q319DeltaProtocol, q320PaddingWaste,
    q321IncrementalView, q322IcebergEqualityDeletes, q323ClickAttribution,
    q324LatenessBudget, q325HllPrecisionAudit, q326DedupSurvivors)
}
