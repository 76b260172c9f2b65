package graft.queries

import graft.Tables
import graft.operators.TextAnalysis

/** Oracle-checked text-analysis surface over `documents`: language ID,
  * quality scoring, token counting, fingerprinting (operators in
  * graft.operators.TextAnalysis).
  */
object TextQueries {

  private def h32(x: String): String = s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  private val markersSql: Map[String, String] =
    TextAnalysis.LangMarkers.toMap.map { case (l, ms) =>
      l -> ms.map(m => s"'$m'").mkString("(", ", ", ")")
    }

  val q29LangId: QueryDef = QueryDef(
    "q29_lang_id",
    (s, dir) => TextAnalysis.langId(Tables.load(s, dir, "documents")).orderBy("doc_id"),
    Some(s"""
      SELECT doc_id, s_en, s_fr, s_de, s_es,
             CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                  WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                  WHEN s_de >= s_es THEN 'de'
                  ELSE 'es' END AS pred_lang
      FROM (
        SELECT doc_id,
          ${TextAnalysis.LangMarkers.map { case (l, _) =>
            s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${markersSql(l)})) AS BIGINT) AS s_$l"
          }.mkString(",\n          ")}
        FROM documents)
      ORDER BY doc_id"""))

  val q30QualityScore: QueryDef = QueryDef(
    "q30_quality_score",
    (s, dir) => TextAnalysis.qualityScore(Tables.load(s, dir, "documents")).orderBy("doc_id"),
    Some(s"""
      SELECT doc_id, n_tokens, avg_token_len, stopword_ratio,
             0.5e0 * stopword_ratio
               + 0.3e0 * least(avg_token_len / 10.0e0, 1.0e0)
               + 0.2e0 * least(CAST(n_tokens AS DOUBLE) / 100.0e0, 1.0e0) AS quality
      FROM (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               (CAST(length(text) AS DOUBLE) - CAST(len(w) AS BIGINT) + 1.0e0)
                 / CAST(len(w) AS BIGINT) AS avg_token_len,
               CAST(CAST(len(list_filter(w, t -> t IN ${markersSql("en")})) AS BIGINT) AS DOUBLE)
                 / CAST(len(w) AS BIGINT) AS stopword_ratio
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents))
      ORDER BY doc_id"""))

  val q31TokenCount: QueryDef = QueryDef(
    "q31_token_count",
    (s, dir) => TextAnalysis.tokenCounts(Tables.load(s, dir, "documents")).orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
      FROM documents ORDER BY doc_id"""))

  val q32Fingerprint: QueryDef = QueryDef(
    "q32_fingerprint",
    (s, dir) => TextAnalysis.fingerprints(Tables.load(s, dir, "documents")).orderBy("doc_id"),
    Some(s"""
      WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
                 FROM documents)
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(string_split(norm, ''), c -> ascii(c)::BIGINT)),
               (a, c) -> (a * 31 + c) % 2147483647) AS fp_full,
             list_min(list_transform(generate_series(1, length(norm) - 4),
               i -> ascii(substr(norm, i, 1))::BIGINT * 923521
                  + ascii(substr(norm, i+1, 1))::BIGINT * 29791
                  + ascii(substr(norm, i+2, 1))::BIGINT * 961
                  + ascii(substr(norm, i+3, 1))::BIGINT * 31
                  + ascii(substr(norm, i+4, 1))::BIGINT)) AS fp_min5
      FROM n WHERE length(norm) >= 5 ORDER BY doc_id"""))

  /** TF-IDF top term per document: explode → tf and df aggregations →
    * corpus-count broadcast → deterministic argmax by rounded score.
    */
  val q54Tfidf: QueryDef = QueryDef(
    "q54_tfidf_top_term",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = toks.distinct().groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
        .withColumn("score",
          graft.functions.Det.rdet(col("tf") * log(col("n").cast("double") / col("df")), 6))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("doc_id", "token", "tf", "df", "score")
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT token, count(*) AS df
                FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      scored AS (SELECT doc_id, token, tf, df,
                   floor((tf * ln(CAST(n AS DOUBLE) / df)) * 1e6 + 0.5) / 1e6 AS score
                 FROM tf JOIN dfreq USING (token) CROSS JOIN n)
      SELECT doc_id, token, tf, df, score FROM (
        SELECT doc_id, token, tf, df, score,
               CAST(row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, token) AS INTEGER) AS rk
        FROM scored)
      WHERE rk = 1 ORDER BY doc_id"""))

  /** End-to-end training-data curation — the composite pipeline the
    * extension surface exists for: exact-fingerprint dedup winners →
    * quality-score filter → per-embedding-label diversity cap (top-3 by
    * quality). Each stage is the scale-true primitive: a narrow
    * hash-shuffle dedup, scalar scoring in the scan, a key join onto
    * vector metadata, and a windowed per-group cap.
    */
  val q77Curation: QueryDef = QueryDef(
    "q77_curation",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val docs = Tables.load(s, dir, "documents")
      val keep = TextAnalysis.fingerprints(docs)
        .groupBy("fp_full").agg(min("doc_id").as("doc_id"))
      val quality = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("label"))
      val w = Window.partitionBy("label").orderBy(col("quality").desc, col("doc_id"))
      keep.join(quality, "doc_id")
        .filter(col("quality") >= 0.25d)
        .join(emb, "doc_id")
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("label"), col("rk"), col("doc_id"),
          graft.functions.Det.rdet(col("quality"), 6).as("quality"))
        .orderBy("label", "rk")
    },
    Some(s"""
      WITH nrm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
                   FROM documents),
      fp AS (SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(string_split(norm, ''), c -> ascii(c)::BIGINT)),
                 (a, c) -> (a * 31 + c) % 2147483647) AS fp_full
             FROM nrm WHERE length(norm) >= 5),
      keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp_full),
      q AS (SELECT doc_id,
              0.5e0 * stopword_ratio
                + 0.3e0 * least(avg_token_len / 10.0e0, 1.0e0)
                + 0.2e0 * least(CAST(n_tokens AS DOUBLE) / 100.0e0, 1.0e0) AS quality
            FROM (
              SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_tokens,
                     (CAST(length(text) AS DOUBLE) - CAST(len(w) AS BIGINT) + 1.0e0)
                       / CAST(len(w) AS BIGINT) AS avg_token_len,
                     CAST(CAST(len(list_filter(w, t -> t IN ${markersSql("en")})) AS BIGINT) AS DOUBLE)
                       / CAST(len(w) AS BIGINT) AS stopword_ratio
              FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents))),
      j AS (SELECT e.label, k.doc_id, q.quality
            FROM keep k JOIN q ON q.doc_id = k.doc_id
                 JOIN embeddings e ON e.vec_id = k.doc_id
            WHERE q.quality >= 0.25e0)
      SELECT label, rk, doc_id, floor(quality * 1e6 + 0.5) / 1e6 AS quality FROM (
        SELECT label, doc_id, quality,
               CAST(row_number() OVER (PARTITION BY label
                    ORDER BY quality DESC, doc_id) AS INTEGER) AS rk
        FROM j)
      WHERE rk <= 3 ORDER BY label, rk"""))

  /** Edit-distance string similarity plus string-shaping functions. */
  val q55StringSimilarity: QueryDef = QueryDef(
    "q55_string_similarity",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 12), lit("the fast key")).as("lev"),
          reverse(substring(col("text"), 1, 8)).as("rev8"),
          lpad(col("lang"), 4, "_").as("lang_pad"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(levenshtein(substr(text, 1, 12), 'the fast key') AS INTEGER) AS lev,
             reverse(substr(text, 1, 8)) AS rev8,
             lpad(lang, 4, '_') AS lang_pad
      FROM documents ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(
    q29LangId, q30QualityScore, q31TokenCount, q32Fingerprint, q54Tfidf,
    q55StringSimilarity, q77Curation)
}
