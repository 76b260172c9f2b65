package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Det, HashFunctions}

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * between raw ingest and batch assembly: weighted subset selection,
  * sequence packing, eval-set decontamination, repetition-based quality
  * filtering, and inverted-index statistics. (Extension surface — the
  * reference's own pipeline ends at the heatmap, functions.py:290-328; these
  * generalize its select/filter/agg stages to the LLM-data north star.)
  *
  * Every operator is pure built-in DataFrame API (codegen-friendly, no
  * UDFs) and engine-portable for the DuckDB oracle: hashing through
  * [[HashFunctions.hash32]] (md5-derived), floats through [[Det]] rounding.
  *
  * 100 TB posture, per operator:
  *   - weightedSample: rank-by-key top-k = TakeOrderedAndProject — partial
  *     top-k on every partition, k rows to the driver; no global sort.
  *   - sequencePack: the running sum is windowed PER SHARD (source), so
  *     state never concentrates on one task; shards pack independently,
  *     exactly how a 1000-executor packing job shards a corpus.
  *   - decontaminate: shingle-hash equi-join (shuffle on a 32-bit hash) —
  *     the n-gram-overlap method used to scrub eval sets from pretraining
  *     corpora; never a quadratic doc x doc compare. The eval side is tiny
  *     in practice and broadcastable; the corpus side streams through.
  *   - repetitionStats / invertedIndex: explode + two-level hash agg, fully
  *     partial-aggregated map-side before any shuffle.
  */
object CorpusOps {

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * key_i = ln(u_i) / w_i with u_i a deterministic uniform from the row id,
    * take the k largest keys — equivalent to sampling without replacement
    * with probability proportional to the weight column. The key is rounded
    * (rdet 9) BEFORE ranking so both engines rank the identical value; ties
    * break on doc_id.
    */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    val u = (HashFunctions.hash32(col("doc_id").cast("string")) + lit(1L)) /
      lit(4294967296.0)
    docs.select(col("doc_id"), col("n_chars"),
        Det.rdet(log(u) / col("n_chars"), 9).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .orderBy("doc_id")
  }

  /** SLIDING-WINDOW CHUNKING — the RAG/retrieval ingest operator: each
    * document is cut into word windows of `size` starting every `stride`
    * words (overlap = size − stride preserves cross-boundary context), one
    * output row per chunk with its 1-based start offset, actual length
    * (the tail may be short), character count, and first word. Chunking is
    * per-document expression work (explode over a sequence — no shuffle at
    * all until a consumer aggregates), so it scales embarrassingly; a
    * chunk never spans documents.
    */
  def slidingChunks(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(stride >= 1 && width >= stride,
      "slidingChunks expects 1 <= stride <= width")
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n"), col("ws"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), col("ws"),
        explode(sequence(lit(0),
          expr(s"CAST((n - 1) div $stride AS INT)"))).as("j"))
      .select(col("doc_id"), col("j").cast("long").as("chunk_id"),
        (col("j") * stride + 1).cast("long").as("start_word"),
        least(lit(width.toLong), col("n") - col("j") * stride)
          .as("chunk_len"),
        length(concat_ws(" ",
          slice(col("ws"), col("j") * stride + 1, lit(width))))
          .cast("long").as("chunk_chars"),
        expr(s"element_at(ws, j * $stride + 1)").as("first_word"))
  }

  /** Contiguous sequence packing: documents are laid out in doc_id order
    * within each shard (`source`) and cut into fixed-capacity context
    * windows by their starting token offset — pack = cum_tokens_before DIV
    * capacity. The streaming analogue of first-fit packing: one windowed
    * cumulative sum per shard, no sequential driver loop, documents may
    * straddle a boundary (they start in the pack that owns their offset).
    * Returns one row per (source, pack_id) with occupancy stats.
    */
  def sequencePack(docs: DataFrame, capacity: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .withColumn("cum_before", coalesce(sum("tok").over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div $capacity"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("tok_sum"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "pack_id")
  }

  /** [[sequencePack]] under CALLER-SUPPLIED token counts — the
    * trained-tokenizer packing currency (q297): `tokens` is any
    * (doc_id, tok) frame, e.g.
    * [[TextAnalysis.bpeTokenCounts]]' `n_bpe_tokens` renamed, so packing
    * budgets count what the training run will actually consume instead of
    * [[sequencePack]]'s whitespace proxy. Docs absent from `tokens` (no
    * words) pack at zero cost. Same per-source streaming-cumsum shape —
    * the window is partitioned by source, never global, so packing scales
    * with the largest source, not the corpus.
    */
  def sequencePackBy(docs: DataFrame, tokens: DataFrame,
      capacity: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("source"), col("doc_id"))
      .join(tokens.select(col("doc_id"), col("tok").cast("long").as("tok")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("tok"))
      .withColumn("cum_before", coalesce(sum("tok").over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div $capacity"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("tok_sum"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "pack_id")
  }

  /** All word n-gram shingle hashes of each document: (doc_id, carry...,
    * gh) with gh the 32-bit hash of the space-joined n-gram. Documents
    * shorter than n tokens contribute nothing. `carry` columns ride along
    * unchanged (e.g. an event-time column for the streaming caller) — ONE
    * definition of shingling, so batch and streaming decontamination can
    * never drift apart.
    */
  def shingleHashes(docs: DataFrame, n: Int, carry: Seq[String] = Nil): DataFrame =
    docs.select(col("doc_id") +: carry.map(col) :+ split(col("text"), " ").as("w"): _*)
      .filter(size(col("w")) >= n)
      .select(col("doc_id") +: carry.map(col) :+ explode(transform(
        sequence(lit(0), size(col("w")) - n),
        i => HashFunctions.hash32(concat_ws(" ", slice(col("w"), i + lit(1), lit(n))))
      )).as("gh"): _*)

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with an eval-set document (the published n-gram-overlap scrub).
    * Output per contaminated corpus doc: how many distinct shingles leaked,
    * from how many distinct eval docs, and the smallest offending eval doc.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, n: Int): DataFrame = {
    val c = shingleHashes(corpus, n).toDF("doc_id", "gh")
    val e = shingleHashes(evalSet, n).toDF("eval_doc", "gh")
    c.join(e, "gh")
      .groupBy("doc_id")
      .agg(count_distinct(col("gh")).as("n_shared_shingles"),
        count_distinct(col("eval_doc")).as("n_eval_docs"),
        min("eval_doc").as("min_eval_doc"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition metrics per document: duplicate-word fraction,
    * most-frequent-word fraction, most-frequent-bigram fraction, and a
    * repetition flag. Fractions are rounded (rdet 6) before the threshold
    * compare so both engines flag identically.
    */
  def repetitionStats(docs: DataFrame,
                      topWordMax: Double = 0.12,
                      dupWordMax: Double = 0.6): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val wordAgg = words.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), count(lit(1)).as("n_distinct"),
        max("c").as("top_word"))
    val bigrams = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("w")) - 2),
        i => concat_ws(" ", slice(col("w"), i + lit(1), lit(2))))).as("bg"))
    val bigramAgg = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram"))
    val dupFrac = Det.rdet(lit(1.0) -
      col("n_distinct").cast("double") / col("n_words"), 6)
    val topWordFrac = Det.rdet(col("top_word").cast("double") / col("n_words"), 6)
    val topBigramFrac = Det.rdet(col("top_bigram").cast("double") / col("n_bigrams"), 6)
    wordAgg.join(bigramAgg, "doc_id")
      .select(col("doc_id"), col("n_words"),
        dupFrac.as("dup_word_frac"),
        topWordFrac.as("top_word_frac"),
        topBigramFrac.as("top_bigram_frac"))
      .withColumn("flagged",
        (col("top_word_frac") > topWordMax || col("dup_word_frac") > dupWordMax)
          .cast("int"))
      .orderBy("doc_id")
  }

  /** Inverted-index statistics per term: document frequency, total term
    * frequency, posting range, and the head of the sorted posting list as a
    * CSV (the t2 comparator rejects nested output types, so the list is
    * stringified; a real index sink would keep the array column).
    */
  def invertedIndex(docs: DataFrame, postingsHead: Int): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(count_distinct(col("doc_id")).as("df"),
        count(lit(1)).as("total_tf"),
        min("doc_id").as("doc_lo"), max("doc_id").as("doc_hi"),
        concat_ws(",", transform(
          slice(sort_array(collect_set(col("doc_id"))), 1, postingsHead),
          _.cast("string"))).as("postings_head"))
      .orderBy("term")
}
