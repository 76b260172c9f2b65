package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions

/** Round-5 surface, seventh tranche: lakehouse maintenance and
  * training-data preparation — compaction planning, tokenizer vocabulary
  * coverage, overlapping chunk windows, df-capped sparse cosine,
  * stratified holdout splits, and histogram-sketch quantiles.
  */
object Round5Queries7 {

  /** Lakehouse FILE-COMPACTION planner — the OPTIMIZE/bin-packing step
    * every large table needs: within each partition (`source`), files
    * (here documents standing in, size = n_chars) are packed in arrival
    * (doc_id) order into target-size bins; a bin closes when the running
    * size crosses the target. Emits the per-bin manifest (file count,
    * bytes, id range) a compactor would execute. Distributed shape: ONE
    * window per partition key (cumulative size in arrival order) + one
    * hash aggregate — planning is per-partition parallel, no global state;
    * at 100 TB the window state is one running long per partition, and a
    * million-file partition costs one sort of its own file list, never a
    * cross-partition shuffle. Fixed arrival order keeps the plan
    * deterministic (first-fit-decreasing would sort by size — better
    * packing, same plan shape — but any greedy packing is order-defined;
    * arrival order is what incremental compactors use so already-written
    * bins stay stable).
    */
  val q151CompactionPlan: QueryDef = QueryDef(
    "q151_compaction_plan",
    (s, dir) => {
      val target = 4000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum(col("n_chars")).over(w))
        // bin = which target-multiple the EXCLUSIVE running size sits in:
        // integer floor-div of exact longs, engine-portable
        .withColumn("bin", ((col("cum") - col("n_chars"))
          - pmod(col("cum") - col("n_chars"), lit(target))) / target)
        .groupBy(col("source"), col("bin").cast("long").as("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "bin")
    },
    Some("""
      WITH f AS (SELECT source, doc_id, n_chars,
                        SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_chars AS excl
                 FROM documents)
      SELECT source, CAST(excl // 4000 AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(SUM(n_chars) AS BIGINT) AS bytes,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM f GROUP BY 1, 2 ORDER BY source, bin"""))

  /** Tokenizer VOCABULARY COVERAGE — the out-of-vocabulary rate a
    * fixed-vocab tokenizer would see per document: vocabulary = the top-20
    * corpus words (count desc, word asc — a total order), per-doc OOV
    * fraction emitted ×10⁴ as a BIGINT (Det protocol). Distributed shape:
    * the vocabulary is a corpus-wide hash aggregate reduced to k rows
    * (TakeOrderedAndProject — every partition keeps k, the driver merges
    * P×k), broadcast back against the exploded token stream; per-doc
    * coverage is one more hash aggregate. The vocabulary is the ONLY
    * driver-sized object — k rows at any corpus size.
    */
  val q152OovRate: QueryDef = QueryDef(
    "q152_oov_rate",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(20)
        .select(col("w"), lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_e4",
          floor(col("n_oov").cast("double") / col("n_tokens") * 1e4 + 0.5).cast("long"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM documents),
      t AS (SELECT doc_id, w FROM toks WHERE w != ''),
      vocab AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM t GROUP BY 1)
                ORDER BY cnt DESC, w LIMIT 20)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(floor(CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) * 1e4 + 0.5) AS BIGINT) AS oov_e4
      FROM t LEFT JOIN vocab ON t.w = vocab.w
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Overlapping CHUNK WINDOWS — the context-window chunking step of a
    * RAG / pretraining pipeline: each document splits into token windows
    * of size 8 at stride 4; every full window becomes a chunk row with an
    * order-sensitive rolling checksum (a 31-ary polynomial fold of the
    * engine-portable token hashes — DuckDB's list_reduce seeds with the
    * first element, mirrored by aggregate over the tail with the head as
    * init). Distributed shape: a pure per-document projection + explode —
    * no shuffle at all before the output sort; chunk count ~n/stride rows
    * per doc. Docs shorter than one window are dropped (the padding policy
    * is the caller's; a production pipeline pads or merges tails).
    */
  val q153ChunkWindows: QueryDef = QueryDef(
    "q153_chunk_windows",
    (s, dir) => {
      val size_ = 8
      val stride = 4
      val prime = HashFunctions.Prime
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= size_)
      base.select(col("doc_id"),
          explode(transform(
            sequence(lit(0), floor((size(col("t")) - size_) / stride).cast("int")),
            k => {
              val chunk = slice(col("t"), k * stride + 1, lit(size_))
              val hs = transform(chunk, w => HashFunctions.hash32(w))
              struct(
                k.cast("long").as("chunk_idx"),
                element_at(chunk, 1).as("first_tok"),
                element_at(chunk, size_).as("last_tok"),
                aggregate(slice(hs, lit(2), lit(size_ - 1)), element_at(hs, 1),
                  (acc, x) => pmod(acc * 31L + x, lit(prime))).as("chash"))
            })).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          col("c.first_tok").as("first_tok"), col("c.last_tok").as("last_tok"),
          col("c.chash").as("chash"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 8),
      c AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                   list_slice(t, k * 4 + 1, k * 4 + 8) AS chunk
            FROM d, unnest(range(0, (len(t) - 8) // 4 + 1)) u(k))
      SELECT doc_id, chunk_idx,
             chunk[1] AS first_tok, chunk[8] AS last_tok,
             CAST(list_reduce(list_transform(chunk,
               w -> (('0x' || substr(md5(w), 1, 8))::BIGINT)),
               (acc, x) -> (acc * 31 + x) % ${HashFunctions.Prime}) AS BIGINT) AS chash
      FROM c ORDER BY doc_id, chunk_idx"""))

  /** DF-CAPPED sparse cosine — q136 with the production stop-word bound
    * actually applied: postings for terms whose document frequency exceeds
    * the cap (20) are DROPPED before the self-join, so the join work bound
    * Σ df(t)² is enforced by construction (≤ cap²·|terms|) instead of
    * assumed from the data. This is the knob that keeps the inverted-index
    * route alive at 100 TB — a boilerplate phrase shared by a million
    * documents would otherwise put 10¹² rows through one term key; capped,
    * it contributes nothing (and near-duplicate detection is the dedup
    * family's job, not the similarity ranker's). Norms use the SAME capped
    * postings, so cosine stays a true cosine over the capped vector space.
    * Output shape matches q136 (top-15 by cosine); values differ where
    * common-term mass is discarded — the documented recall trade.
    */
  val q154SparseCosineCapped: QueryDef = QueryDef(
    "q154_sparse_cosine_capped",
    (s, dir) => {
      val cap = 20
      val tfAll = Tables.load(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          explode(graft.plans.WordGrams(col("text"), 3, '_')).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tfAll.groupBy("w").agg(count(lit(1)).as("df"))
      val tf = tfAll.join(df.filter(col("df") <= cap).select("w"), "w")
        .transform(graft.operators.ScopedCache.cache) // capped postings feed the norms AND both join sides
      val norms = tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("nsq"))
      val dots = tf.as("a").join(tf.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("i"), col("nsq").as("na")), "i")
        .join(norms.select(col("doc_id").as("j"), col("nsq").as("nb")), "j")
        .withColumn("cosine",
          col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .orderBy(col("cosine").desc, col("i"), col("j"))
        .limit(15)
        .select(col("i"), col("j"), col("dot"),
          graft.functions.Det.rdet(col("cosine"), 6).as("cosine"))
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                  WHERE len(string_split(text, ' ')) >= 3),
      tf0 AS (SELECT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS w,
                     CAST(count(*) AS BIGINT) AS tf
              FROM ws, unnest(range(1, len(ws) - 1)) AS u(i) GROUP BY 1, 2),
      keep AS (SELECT w FROM (SELECT w, count(*) AS df FROM tf0 GROUP BY 1)
               WHERE df <= 20),
      tf AS (SELECT tf0.* FROM tf0 JOIN keep USING (w)),
      norms AS (SELECT doc_id, SUM(tf * tf) AS nsq FROM tf GROUP BY 1),
      dots AS (SELECT a.doc_id AS i, b.doc_id AS j, SUM(a.tf * b.tf) AS dot
               FROM tf a JOIN tf b ON a.w = b.w AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      scored AS (SELECT i, j, CAST(dot AS BIGINT) AS dot,
                        CAST(dot AS DOUBLE) /
                          (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
                          AS cosine
                 FROM dots JOIN norms na ON na.doc_id = i
                           JOIN norms nb ON nb.doc_id = j)
      SELECT i, j, dot, floor(cosine * 1e6 + 0.5) / 1e6 AS cosine
      FROM scored ORDER BY scored.cosine DESC, i, j LIMIT 15"""))

  /** STRATIFIED train/val/test split — the holdout assignment every
    * training pipeline needs, with EXACT per-stratum fractions (8/1/1
    * tenths) rather than expected ones: within each stratum (`source`),
    * docs order by (md5 hash, doc_id) — a deterministic shuffle that is
    * reproducible across engines, partitionings, and reruns (rand(seed)
    * is none of those) — and the first ⌊0.8n⌋ go to train, next ⌊0.9n⌋−
    * ⌊0.8n⌋ to val, rest to test. The boundaries compare PURE INTEGERS
    * (rn·10 ≤ n·8) — no float fraction arithmetic to round differently
    * anywhere. Distributed shape: one window per stratum key; strata
    * split independently and in parallel, the per-stratum count rides the
    * same window. Unlike hash-mod sampling (q84's shape) the fractions
    * are exact per stratum, which is what keeps a rare stratum from
    * losing its entire val split to sampling variance.
    */
  val q155StratifiedSplit: QueryDef = QueryDef(
    "q155_stratified_split",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("h", "doc_id")
      val wn = org.apache.spark.sql.expressions.Window.partitionBy("source")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          HashFunctions.hash32(concat(lit("d"), col("doc_id").cast("string"))).as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("split",
          when(col("rn") * 10 <= col("n") * 8, "train")
            .when(col("rn") * 10 <= col("n") * 9, "val")
            .otherwise("test"))
        .select(col("doc_id"), col("source"), col("rn"), col("split"))
        .orderBy("doc_id")
    },
    Some("""
      WITH h AS (SELECT doc_id, source,
                        ('0x' || substr(md5('d' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
                 FROM documents),
      r AS (SELECT doc_id, source,
                   CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                     AS BIGINT) AS rn,
                   CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM h)
      SELECT doc_id, source, rn,
             CASE WHEN rn * 10 <= n * 8 THEN 'train'
                  WHEN rn * 10 <= n * 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM r ORDER BY doc_id"""))

  /** Histogram-sketch QUANTILE — the missing member of the mergeable-
    * sketch family (HLL q132, count-min q129, Misra–Gries, bitmap q130):
    * per-group equi-width bucket counts are a plain hash aggregate whose
    * state is O(buckets) and merges by ADDITION across partitions, days,
    * or shards — the shape a 100 TB percentile service maintains — and a
    * quantile reads off the cumulative counts without touching data
    * again. Two column-pruned passes (exact min/max, then counts; the
    * Ranks bucket construction, reused as a SKETCH), one tiny window over
    * the 64-row-per-group count relation. Emits the bucket holding each
    * group's median and its value bounds — the sketch's answer, exact to
    * (hi−lo)/64 — alongside n; all integer cents, no doubles.
    */
  val q156HistogramQuantile: QueryDef = QueryDef(
    "q156_histogram_quantile",
    (s, dir) => {
      val B = 64L
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      val ext = li.groupBy("flag").agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      // greatest(...,1) guards the degenerate single-value group (hi == lo
      // would divide by zero); every v then lands in bucket 0, correctly
      val d = greatest(col("hi") - col("lo"), lit(1L))
      val bkt = least(
        ((col("v") - col("lo")) * B - pmod((col("v") - col("lo")) * B, d)) / d,
        lit(B - 1)).cast("long")
      val counts = li.join(broadcast(ext), "flag")
        .withColumn("b", bkt)
        .groupBy("flag", "b").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("b")
      val wn = org.apache.spark.sql.expressions.Window.partitionBy("flag")
      counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wn))
        .filter(col("cum") * 2 >= col("n") && (col("cum") - col("c")) * 2 < col("n"))
        .join(broadcast(ext), "flag")
        .select(col("flag"), col("n"), col("b").as("med_bucket"),
          (col("lo") + ((col("hi") - col("lo")) * col("b")
            - pmod((col("hi") - col("lo")) * col("b"), lit(B))) / B)
            .cast("long").as("bucket_lo_cents"),
          (col("lo") + ((col("hi") - col("lo")) * (col("b") + 1)
            - pmod((col("hi") - col("lo")) * (col("b") + 1), lit(B))) / B)
            .cast("long").as("bucket_hi_cents"))
        .orderBy("flag")
    },
    Some("""
      WITH li AS (SELECT l_returnflag AS flag,
                         CAST(floor(l_extendedprice * 100 + 0.5e0) AS BIGINT) AS v
                  FROM lineitem),
      ext AS (SELECT flag, min(v) AS lo, max(v) AS hi FROM li GROUP BY 1),
      b AS (SELECT li.flag AS flag,
                   least(((v - lo) * 64) // greatest(hi - lo, 1), 63) AS b
            FROM li JOIN ext ON li.flag = ext.flag),
      counts AS (SELECT flag, b, CAST(count(*) AS BIGINT) AS c
                 FROM b GROUP BY 1, 2),
      cum AS (SELECT flag, b, c,
                     SUM(c) OVER (PARTITION BY flag ORDER BY b) AS cum,
                     SUM(c) OVER (PARTITION BY flag) AS n
              FROM counts)
      SELECT cum.flag, CAST(n AS BIGINT) AS n, b AS med_bucket,
             CAST(lo + ((hi - lo) * b) // 64 AS BIGINT) AS bucket_lo_cents,
             CAST(lo + ((hi - lo) * (b + 1)) // 64 AS BIGINT) AS bucket_hi_cents
      FROM cum JOIN ext ON cum.flag = ext.flag
      WHERE cum * 2 >= n AND (cum - c) * 2 < n
      ORDER BY cum.flag"""))

  /** MULTI-quantile read from ONE histogram sketch — the property that
    * justifies the sketch at 100 TB: q156's per-group bucket counts are
    * computed once, and p25/p50/p75/p95 ALL read off the same cumulative
    * relation (4 targets × 64 buckets per group — no further data passes,
    * ever; a sorted-data approach would re-sort or re-select per
    * quantile). Target ranks are exact integers (⌈pct·n/100⌉ via integer
    * arithmetic); each target lands in the bucket whose cumulative range
    * covers it. Emits (flag, pct, bucket, bucket value bounds in cents).
    */
  val q161QuantileGrid: QueryDef = QueryDef(
    "q161_quantile_grid",
    (s, dir) => {
      val B = 64L
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      val ext = li.groupBy("flag").agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val d = greatest(col("hi") - col("lo"), lit(1L))
      val bkt = least(
        ((col("v") - col("lo")) * B - pmod((col("v") - col("lo")) * B, d)) / d,
        lit(B - 1)).cast("long")
      val counts = li.join(broadcast(ext), "flag")
        .withColumn("b", bkt)
        .groupBy("flag", "b").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("b")
      val wn = org.apache.spark.sql.expressions.Window.partitionBy("flag")
      val cum = counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wn))
      val targets = s.range(1).select(
        explode(array(Seq(25, 50, 75, 95).map(p => lit(p)): _*)).as("pct"))
      val tgt = col("pct") * col("n") + 99L
      cum.join(broadcast(targets))
        .withColumn("t", (tgt - pmod(tgt, lit(100L))) / 100L)
        .filter(col("cum") >= col("t") && col("cum") - col("c") < col("t"))
        .join(broadcast(ext), "flag")
        .select(col("flag"), col("pct").cast("long").as("pct"), col("b").as("bucket"),
          (col("lo") + ((col("hi") - col("lo")) * col("b")
            - pmod((col("hi") - col("lo")) * col("b"), lit(B))) / B)
            .cast("long").as("bucket_lo_cents"))
        .orderBy("flag", "pct")
    },
    Some("""
      WITH li AS (SELECT l_returnflag AS flag,
                         CAST(floor(l_extendedprice * 100 + 0.5e0) AS BIGINT) AS v
                  FROM lineitem),
      ext AS (SELECT flag, min(v) AS lo, max(v) AS hi FROM li GROUP BY 1),
      b AS (SELECT li.flag AS flag,
                   least(((v - lo) * 64) // greatest(hi - lo, 1), 63) AS b
            FROM li JOIN ext ON li.flag = ext.flag),
      counts AS (SELECT flag, b, CAST(count(*) AS BIGINT) AS c
                 FROM b GROUP BY 1, 2),
      cum AS (SELECT flag, b, c,
                     SUM(c) OVER (PARTITION BY flag ORDER BY b) AS cum,
                     SUM(c) OVER (PARTITION BY flag) AS n
              FROM counts),
      tg AS (SELECT cum.*, pct, (pct * n + 99) // 100 AS t
             FROM cum, unnest([25, 50, 75, 95]) u(pct))
      SELECT tg.flag AS flag, CAST(pct AS BIGINT) AS pct, b AS bucket,
             CAST(lo + ((hi - lo) * b) // 64 AS BIGINT) AS bucket_lo_cents
      FROM tg JOIN ext ON tg.flag = ext.flag
      WHERE cum >= t AND cum - c < t
      ORDER BY tg.flag, pct"""))

  val all: Seq[QueryDef] =
    Seq(q151CompactionPlan, q152OovRate, q153ChunkWindows, q154SparseCosineCapped,
      q155StratifiedSplit, q156HistogramQuantile, q161QuantileGrid)
}
