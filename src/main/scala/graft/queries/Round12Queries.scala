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
      graft.operators.Ranks.globalRowNumber(diff,
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
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 6)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 6)," +
            " i -> concat_ws(' ', slice(ws, i + 1, 6)))")).as("gram"))
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

  val all: Seq[QueryDef] = Seq(q297PackBpeBudget, q298CurriculumStages,
    q299MemorizationGrams, q302BlockDedup, q303TemperatureMix,
    q304KAnonymity, q306GroupAdvantage)
}
