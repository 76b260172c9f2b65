package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Det
import graft.operators.CorpusOps

/** Round-3 training-data-pipeline surface: weighted subset selection,
  * sequence packing, eval-set decontamination, repetition filtering,
  * inverted-index statistics, domain-mixture reweighting, and z-score
  * anomaly detection. Operators in [[graft.operators.CorpusOps]];
  * determinism per [[graft.functions.Det]].
  */
object PipelineQueries {

  private def h32(x: String): String = s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  /** A-ES weighted sampling: top-50 documents by ln(u)/w key with
    * w = n_chars — longer documents proportionally likelier. Physical plan
    * is TakeOrderedAndProject (distributed partial top-k), not a global
    * sort.
    */
  val q99WeightedSample: QueryDef = QueryDef(
    "q99_weighted_sample",
    (s, dir) => CorpusOps.weightedSample(Tables.load(s, dir, "documents"), 50),
    Some(s"""
      SELECT doc_id, n_chars, key FROM (
        SELECT doc_id, n_chars,
               floor((ln((${h32("CAST(doc_id AS VARCHAR)")} + 1) / 4294967296.0e0)
                 / n_chars) * 1e9 + 0.5) / 1e9 AS key
        FROM documents ORDER BY key DESC, doc_id LIMIT 50)
      ORDER BY doc_id"""))

  /** Contiguous sequence packing into 512-token context windows, sharded by
    * source (the per-shard windowed cumsum is the scale path — no global
    * single-partition window).
    */
  val q100SequencePack: QueryDef = QueryDef(
    "q100_sequence_pack",
    (s, dir) => CorpusOps.sequencePack(Tables.load(s, dir, "documents"), 512),
    Some("""
      WITH t AS (SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                 FROM documents),
      c AS (SELECT source, doc_id, tok,
              CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS cum_before
            FROM t)
      SELECT source, CAST(cum_before // 512 AS BIGINT) AS pack_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tok_sum,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY source, pack_id ORDER BY source, pack_id"""))

  /** Eval-set decontamination via 4-gram shingle-hash overlap: documents
    * with doc_id % 20 == 0 stand in for the benchmark set; every other
    * document sharing any 4-gram with them is flagged with leak counts.
    */
  val q101Decontaminate: QueryDef = QueryDef(
    "q101_decontaminate",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      CorpusOps.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), 4)
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(w) - 3),
                i -> ${h32("array_to_string(w[i:i+3], ' ')")})) AS gh
            FROM t WHERE len(w) >= 4),
      e AS (SELECT doc_id AS eval_doc, gh FROM g WHERE doc_id % 20 = 0),
      c AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 != 0)
      SELECT c.doc_id,
             CAST(count(DISTINCT c.gh) AS BIGINT) AS n_shared_shingles,
             CAST(count(DISTINCT e.eval_doc) AS BIGINT) AS n_eval_docs,
             min(e.eval_doc) AS min_eval_doc
      FROM c JOIN e USING (gh)
      GROUP BY c.doc_id ORDER BY c.doc_id"""))

  /** Gopher-style repetition metrics + flag per document. */
  val q102RepetitionFilter: QueryDef = QueryDef(
    "q102_repetition_filter",
    (s, dir) => CorpusOps.repetitionStats(Tables.load(s, dir, "documents")),
    Some("""
      WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
      wc AS (SELECT doc_id, tok, count(*) AS c FROM words GROUP BY 1, 2),
      wa AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_word
             FROM wc GROUP BY 1),
      bgs AS (SELECT doc_id,
                unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> array_to_string(w[i:i+1], ' '))) AS bg
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
              WHERE len(w) >= 2),
      bc AS (SELECT doc_id, bg, count(*) AS c FROM bgs GROUP BY 1, 2),
      ba AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(max(c) AS BIGINT) AS top_bigram
             FROM bc GROUP BY 1)
      SELECT doc_id, n_words, dup_word_frac, top_word_frac, top_bigram_frac,
             CAST(CASE WHEN top_word_frac > 0.12e0 OR dup_word_frac > 0.6e0
                  THEN 1 ELSE 0 END AS INTEGER) AS flagged
      FROM (
        SELECT wa.doc_id, n_words,
               floor((1.0e0 - CAST(n_distinct AS DOUBLE) / n_words) * 1e6 + 0.5)
                 / 1e6 AS dup_word_frac,
               floor((CAST(top_word AS DOUBLE) / n_words) * 1e6 + 0.5)
                 / 1e6 AS top_word_frac,
               floor((CAST(top_bigram AS DOUBLE) / n_bigrams) * 1e6 + 0.5)
                 / 1e6 AS top_bigram_frac
        FROM wa JOIN ba ON wa.doc_id = ba.doc_id)
      ORDER BY doc_id"""))

  /** Inverted-index statistics per term with a CSV posting-list head. */
  val q103InvertedIndex: QueryDef = QueryDef(
    "q103_inverted_index",
    (s, dir) => CorpusOps.invertedIndex(Tables.load(s, dir, "documents"), 5),
    Some("""
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(count(*) AS BIGINT) AS total_tf,
             min(doc_id) AS doc_lo, max(doc_id) AS doc_hi,
             array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',')
               AS postings_head
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term ORDER BY term"""))

  /** Domain-mixture reweighting: temperature-scaled (tau = 0.7) sampling
    * weights per source so underrepresented domains are upsampled —
    * q_i ∝ p_i^0.7, weight_i = q_i / p_i. Two tiny aggregates broadcast
    * against the per-source counts; no global windows.
    */
  val q104MixtureWeights: QueryDef = QueryDef(
    "q104_mixture_weights",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val per = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val tot = docs.agg(count(lit(1)).as("total"))
      val scored = per.crossJoin(broadcast(tot))
        .withColumn("p", Det.rdet(col("n_docs").cast("double") / col("total"), 6))
        .withColumn("pw", Det.rdet(pow(col("p"), 0.7), 6))
      val den = scored.agg(
        (floor(sum(col("pw").cast(DecimalType(30, 8))) * 1e6).cast("long") / 1e6)
          .as("den"))
      scored.crossJoin(broadcast(den))
        .withColumn("q", Det.rdet(col("pw") / col("den"), 6))
        .withColumn("weight", Det.rdet(col("q") / col("p"), 6))
        .select("source", "n_docs", "p", "pw", "q", "weight")
        .orderBy("source")
    },
    Some("""
      WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY source),
      tot AS (SELECT count(*) AS total FROM documents),
      scored AS (SELECT source, n_docs,
                   floor((CAST(n_docs AS DOUBLE) / total) * 1e6 + 0.5) / 1e6 AS p,
                   floor(pow(floor((CAST(n_docs AS DOUBLE) / total) * 1e6 + 0.5)
                     / 1e6, 0.7e0) * 1e6 + 0.5) / 1e6 AS pw
                 FROM per CROSS JOIN tot),
      den AS (SELECT CAST(floor(SUM(CAST(pw AS DECIMAL(30,8))) * 1e6) AS BIGINT)
                / 1e6 AS den FROM scored)
      SELECT source, n_docs, p, pw,
             floor((pw / den) * 1e6 + 0.5) / 1e6 AS q,
             floor((floor((pw / den) * 1e6 + 0.5) / 1e6 / p) * 1e6 + 0.5) / 1e6
               AS weight
      FROM scored CROSS JOIN den ORDER BY source"""))

  /** Per-user z-score anomaly detection over event values. All moments are
    * exact scaled-integer arithmetic (value quantized to 1e-4), so mean and
    * variance are order-independent and engine-identical; only the final
    * z = (n·s − S1)/√(n·S2 − S1²) touches floating point, then is rounded
    * before the |z| > 2 threshold so both engines flag identical rows.
    */
  val q105ZscoreAnomaly: QueryDef = QueryDef(
    "q105_zscore_anomaly",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          floor(col("value") * 1e4 + 0.5).cast("long").as("s"))
      val st = ev.groupBy("user_id").agg(
        count(lit(1)).as("n"), sum("s").as("s1"),
        sum(col("s") * col("s")).as("s2"))
      ev.join(broadcast(st), "user_id")
        .withColumn("varn", col("n") * col("s2") - col("s1") * col("s1"))
        .filter(col("varn") > 0)
        .withColumn("z", Det.rdet(
          (col("n") * col("s") - col("s1")).cast("double") /
            sqrt(col("varn").cast("double")), 6))
        .filter(abs(col("z")) > 2.0)
        .select("event_id", "user_id", "value", "z")
        .orderBy("event_id")
    },
    Some("""
      WITH ev AS (SELECT event_id, user_id, value,
                    CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS s FROM events),
      st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s1, CAST(SUM(s * s) AS BIGINT) AS s2
             FROM ev GROUP BY 1)
      SELECT event_id, user_id, value, z FROM (
        SELECT event_id, ev.user_id AS user_id, value,
               floor((CAST(n * s - s1 AS DOUBLE)
                 / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS z
        FROM ev JOIN st ON ev.user_id = st.user_id
        WHERE n * s2 - s1 * s1 > 0)
      WHERE abs(z) > 2.0e0 ORDER BY event_id"""))

  val all: Seq[QueryDef] = Seq(
    q99WeightedSample, q100SequencePack, q101Decontaminate,
    q102RepetitionFilter, q103InvertedIndex, q104MixtureWeights,
    q105ZscoreAnomaly)
}
