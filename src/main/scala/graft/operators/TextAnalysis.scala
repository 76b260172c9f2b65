package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, and document fingerprinting. All pure Catalyst
  * built-ins (codegen'd, oracle-reproducible); each scales linearly — one
  * narrow projection per document, no shuffle.
  */
object TextAnalysis {

  /** Stopword marker sets per language for the n-gram-free heuristic
    * language-ID. Tiny on purpose: the operator shape (per-language token
    * scoring + deterministic argmax) is what matters, not lexicon size.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "de", "un"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "y", "que", "un"))

  private def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens belonging to a marker set. */
  def markerScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*))).cast("long")

  /** Heuristic language ID: score each language's marker set, argmax with a
    * fixed priority tiebreak (en > fr > de > es).
    */
  def langId(docs: DataFrame): DataFrame = {
    val scored = docs.select(
      col("doc_id") +: LangMarkers.map { case (l, m) =>
        markerScore(col("text"), m).as(s"s_$l")
      }: _*)
    scored.withColumn("pred_lang",
      when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") && col("s_en") >= col("s_es"), "en")
        .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_es"), "fr")
        .when(col("s_de") >= col("s_es"), "de")
        .otherwise("es"))
  }

  /** Document quality scoring from cheap surface statistics: token count,
    * mean token length, stopword ratio — combined into a bounded [0,1] score
    * with pure arithmetic (no libm, so the score is bit-reproducible).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val nTok = size(ts).cast("long")
    val avgTok = (length(col("text")).cast("double") - nTok + 1d) / nTok
    val stopRatio = markerScore(col("text"), LangMarkers.head._2).cast("double") / nTok
    docs.select(col("doc_id"),
      nTok.as("n_tokens"),
      avgTok.as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      (lit(0.5d) * stopRatio
        + lit(0.3d) * least(avgTok / 10d, lit(1.0d))
        + lit(0.2d) * least(nTok.cast("double") / 100d, lit(1.0d))).as("quality"))
  }

  /** Token counting: whitespace tokens plus a BPE-ish bound (runs of up to 4
    * letters / digit runs / single non-alphanumerics — an upper estimate of
    * subword pieces without a vocabulary).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z]{1,4}|[0-9]+|[^a-z0-9 ]")).cast("long").as("n_bpe_tokens"))

  /** Document fingerprints: full-text rolling polynomial hash plus the
    * minimum 5-char-gram hash (a 1-fingerprint winnowing sketch) — two
    * complementary keys for exact and fuzzy grouping.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = Dedup.normalize(col("text"))
    docs.filter(length(norm) >= 5).select(col("doc_id"),
      charFingerprint(norm).as("fp_full"),
      array_min(transform(sequence(lit(1), length(norm) - 4),
        i => hash32(norm.substr(i, lit(5))))).as("fp_min5"))
  }
}
