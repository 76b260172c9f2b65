package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions

/** Round-5 surface, seventh tranche: lakehouse maintenance and
  * training-data preparation — compaction planning, tokenizer vocabulary
  * coverage, and overlapping chunk windows.
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
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 3)," +
            " i -> concat(ws[i], '_', ws[i+1], '_', ws[i+2]))"))
          .as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tfAll.groupBy("w").agg(count(lit(1)).as("df"))
      val tf = tfAll.join(df.filter(col("df") <= cap).select("w"), "w")
        .cache() // capped postings feed the norms AND both join sides
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

  val all: Seq[QueryDef] =
    Seq(q151CompactionPlan, q152OovRate, q153ChunkWindows, q154SparseCosineCapped)
}
