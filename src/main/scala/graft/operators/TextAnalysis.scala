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

  /** PII patterns in the Java-regex ∩ RE2 common dialect, so a DuckDB
    * oracle matches the identical spans.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"

  /** Appends `n_emails`, `n_phones`, `redacted` for the text in `textCol`:
    * the corpus scrubbing pass. Stateless codegen'd string expressions, so
    * the same transform runs unchanged on a batch frame or a readStream
    * frame (StreamingSpec proves the twin).
    */
  def redactPii(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)).cast("int"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)).cast("int"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))

  /** 16-digit payment-card CANDIDATE pattern: a standalone digit run
    * (lookarounds keep a 17+-digit run or an embedded id from matching).
    * Java-dialect lookbehind/lookahead — Spark-side only; the oracle never
    * runs this regex (it predicts the candidates it minted).
    */
  val CardRe = "(?<![0-9])[0-9]{16}(?![0-9])"

  /** Payment-card PII scrub with LUHN validation — the curation pass a
    * bare regex cannot do: every 16-digit run is a CANDIDATE, but only
    * the Luhn checksum (double every second digit from the right, fold
    * digit sums, total ≡ 0 mod 10) separates real card numbers from
    * order ids and ISBNs, and redacting every digit run destroys those.
    * Appends `n_card_candidates`, `n_luhn_valid`, and `scrubbed` (only
    * VALIDATED numbers replaced by `<CARD>`). The validation fold and
    * the replacement fold run per candidate (a handful per document) —
    * stateless expressions, streaming-safe like [[redactPii]].
    */
  def luhnScrub(docs: DataFrame, textCol: String): DataFrame = {
    def luhnOk(c: Column): Column = {
      val chars = split(c, "")
      pmod(aggregate(sequence(lit(0), lit(15)), lit(0), (acc, i) => {
        val d = ascii(element_at(chars, i + 1)) - 48
        // 16-digit number: right-position r = 16 - i is even iff i is
        // even (0-based from the left), so even i doubles
        val dd = when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + dd
      }), lit(10)) === 0
    }
    docs
      .withColumn("card_cands",
        regexp_extract_all(col(textCol), lit(CardRe), lit(0)))
      .withColumn("luhn_valid", filter(col("card_cands"), luhnOk(_)))
      .withColumn("n_card_candidates", size(col("card_cands")).cast("long"))
      .withColumn("n_luhn_valid", size(col("luhn_valid")).cast("long"))
      .withColumn("scrubbed",
        aggregate(col("luhn_valid"), col(textCol),
          // the SAME standalone bounds as candidate extraction: a literal
          // replace would also rewrite the card's digits where they
          // happen to appear INSIDE a longer run (a 17-digit id that was
          // correctly not a candidate). Cards are pure digits, so
          // embedding one in a pattern is metacharacter-safe.
          (acc, card) => regexp_replace(acc,
            concat(lit("(?<![0-9])"), card, lit("(?![0-9])")),
            lit("<CARD>"))))
      .drop("card_cands", "luhn_valid")
  }

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
    * subword pieces without a vocabulary). For counts under a TRAINED
    * vocabulary — the numbers a tokenizer actually produces — use
    * [[bpeTokenCounts]] with [[bpeTrain]]'s induced merges.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z]{1,4}|[0-9]+|[^a-z0-9 ]")).cast("long").as("n_bpe_tokens"))

  /** Per-WORD token counts under a trained merge list: the corpus's
    * distinct words, each segmented by replaying `merges` (the pairs
    * [[bpeTrain]] induced, in training order) through the
    * [[bpeApplyMerge]] greedy fold. Returns (w, nt). The fold runs over
    * the VOCABULARY only — per-occurrence rows never see it; corpus-scale
    * consumers equi-join this table back ([[bpeTokenCounts]], q275's
    * budget path).
    */
  def bpeWordTokens(docs: DataFrame, merges: Seq[String]): DataFrame = {
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    merges.foldLeft(
      words.select(col("w"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("s"))) {
      (df, mp) => df.select(col("w"), bpeApplyMerge(col("s"), lit(mp)).as("s"))
    }.select(col("w"), size(split(trim(col("s")), " ")).cast("long").as("nt"))
  }

  /** Per-DOCUMENT token counts under a trained merge list — the real
    * replacement for [[tokenCounts]]' regex proxy once a vocabulary
    * exists: (doc_id, n_words, n_bpe_tokens) where n_bpe_tokens sums the
    * trained segmentation over every word occurrence. One explode, one
    * vocabulary equi-join, one per-doc aggregate.
    */
  def bpeTokenCounts(docs: DataFrame, merges: Seq[String]): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(bpeWordTokens(docs, merges), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("nt")).as("n_bpe_tokens"))

  /** Document fingerprints: full-text rolling polynomial hash plus the
    * minimum 5-char-gram polynomial hash (a 1-fingerprint winnowing
    * sketch) — two complementary keys for exact and fuzzy grouping. The gram
    * hash is Σ ascii(c_j)·31^(4-j) — exact integer arithmetic (max ~2.4e8),
    * far cheaper than an md5 per gram and still engine-portable.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = Dedup.normalize(col("text"))
    // Single fold over the char codes computing BOTH fingerprints at once.
    // State: (fp = rolling polynomial, p1..p4 = last four char codes,
    // mn = min 5-gram hash so far, n = chars seen). One normalization and
    // one pass per document — naive per-gram substr probing re-evaluates the
    // normalization expression per access (measured 4x slower than even the
    // md5-per-gram variant it replaced).
    val cs = transform(split(norm, ""), c => ascii(c).cast("long"))
    val init = struct(
      lit(0L).as("fp"), lit(0L).as("p1"), lit(0L).as("p2"), lit(0L).as("p3"),
      lit(0L).as("p4"), lit(Long.MaxValue).as("mn"), lit(0L).as("n"))
    val fold = aggregate(
      cs, init,
      (acc, c) => {
        val n = acc.getField("n") + 1L
        val gram = acc.getField("p1") * 923521L + acc.getField("p2") * 29791L +
          acc.getField("p3") * 961L + acc.getField("p4") * 31L + c
        struct(
          pmod(acc.getField("fp") * 31L + c, lit(Prime)).as("fp"),
          acc.getField("p2").as("p1"), acc.getField("p3").as("p2"),
          acc.getField("p4").as("p3"), c.as("p4"),
          when(n >= 5L && gram < acc.getField("mn"), gram)
            .otherwise(acc.getField("mn")).as("mn"),
          n.as("n"))
      })
    docs.filter(length(norm) >= 5).select(col("doc_id"), fold.as("st"))
      .select(col("doc_id"),
        col("st.fp").as("fp_full"), col("st.mn").as("fp_min5"))
  }

  /** One greedy BPE merge round applied to a space-separated symbol string
    * `s` (form " a b c ", leading/trailing space): every leftmost
    * non-overlapping occurrence of the pair `mp` ("a b") fuses into "ab".
    *
    * Implemented as a leftmost fold over the symbol list, NOT a string
    * replace of " a b ": the replace form consumes the shared separator —
    * the trailing space of one match is the leading space of an adjacent
    * one — so " a b a b " merged only once, diverging from textbook greedy
    * BPE on adjacent repeats. The fold splices the merged symbol whenever
    * the accumulator's last symbol is `a` and the next is `b` (an
    * endswith(" a") check is exact because symbols never contain spaces),
    * which merges every non-overlapping occurrence left to right. The
    * identical fold is expressible in DuckDB (list_reduce seeds with the
    * first element, mirrored here by aggregate over slice(..., 2, n) with
    * the first element as init), so oracle comparisons share the
    * semantics. Single-symbol words pass through (empty slice -> init).
    */
  def bpeApplyMerge(s: Column, mp: Column): Column = {
    val t = split(trim(s), " ")
    val a = element_at(split(mp, " "), 1)
    val b = element_at(split(mp, " "), 2)
    val merged = regexp_replace(mp, " ", "")
    val folded = aggregate(
      slice(t, lit(2), size(t)),
      element_at(t, 1),
      (acc, x) =>
        when((acc === a || acc.endsWith(concat(lit(" "), a))) && x === b,
          concat(acc.substr(lit(1), length(acc) - length(a)), merged))
          .otherwise(concat(acc, lit(" "), x)))
    concat(lit(" "), folded, lit(" "))
  }

  /** FULL BPE vocabulary induction — `rounds` greedy merge rounds over the
    * corpus's word-frequency table, the trainer behind every
    * byte-pair-encoding tokenizer. Each round runs (1) distributed
    * corpus-weighted adjacent-pair counts over the CURRENT symbol
    * sequences, (2) the argmax pair (count desc, pair asc — a total
    * order) fetched as ONE driver scalar row — the dedupClusters/labelSum
    * pattern: rounds aggregate the VOCABULARY, never the corpus, and the
    * driver only ever holds one row per round — (3) the merge applied as
    * the leftmost greedy fold ([[bpeApplyMerge]]), and (4) the post-merge
    * corpus token count (the compression trajectory a tokenizer team
    * actually tracks while choosing the vocabulary size). Eager-fixpoint
    * cache discipline: each round's symbol table is materialized by the
    * token-count aggregate before the superseded one unpersists, and the
    * final table unpersists on exit (the RESULT is the tiny merge table,
    * not the symbols).
    *
    * Output: (round, pair, merged, pc, corpus_tokens) — `rounds` rows,
    * fewer if the vocabulary exhausts (no adjacent pair left) first.
    */
  /** Memoized per (session, docs CANONICALIZED plan, rounds) via
    * [[PlanMemo]]: the trainer's result is a tiny driver-side merge
    * table, and four queries (q230/q231/q275/q293) train over the SAME
    * corpus, so within one session the fixpoint runs once. The memo
    * computes OUTSIDE any map lock, so concurrent trainer calls on
    * different corpora (ThroughputBench streams) never serialize behind
    * an unrelated training job. Staleness semantics match a
    * session-cached DataFrame's (same plan over changed files serves
    * the memo).
    */
  private val bpeMemo = new PlanMemo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int),
    Seq[(Long, String, String, Long, Long)]]()

  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    val rows = bpeMemo.getOrCompute(docs.sparkSession,
      (docs.queryExecution.analyzed.canonicalized, rounds))(
      bpeTrainRows(docs, rounds))
    val spark = docs.sparkSession
    import spark.implicits._
    rows.toDF("round", "pair", "merged", "pc", "corpus_tokens")
  }

  private def bpeTrainRows(docs: DataFrame,
      rounds: Int): Seq[(Long, String, String, Long, Long)] = {
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var sym = words.select(col("w"), col("cnt"),
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("s")).cache()
    val out = Seq.newBuilder[(Long, String, String, Long, Long)]
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val pc = sym.select(col("cnt"), split(trim(col("s")), " ").as("t"))
          .filter(size(col("t")) >= 2) // sequence() descends below 2
          .select(col("cnt"), explode(expr(
            "transform(sequence(0, size(t) - 2)," +
              " i -> concat(t[i], ' ', t[i+1]))")).as("p"))
          .groupBy("p").agg(sum(col("cnt")).as("pc"))
        val top = pc.orderBy(col("pc").desc, col("p")).limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val cnt = top(0).getLong(1)
          val next = sym.select(col("w"), col("cnt"),
            bpeApplyMerge(col("s"), lit(pair)).as("s")).cache()
          val postTokens = next // materializes next before the handoff
            .agg(sum(col("cnt") * size(split(trim(col("s")), " "))))
            .head().getLong(0)
          sym.unpersist()
          sym = next
          out += ((r.toLong, pair, pair.replace(" ", ""), cnt, postTokens))
          r += 1
        }
      }
      out.result()
    } finally sym.unpersist()
  }

  /** HTML boilerplate-block patterns, Java ∩ RE2 dialect ((?s) dotall +
    * non-greedy bodies, as for [[EmailRe]]): the elements a jusText-style
    * main-content extractor drops wholesale before any text operator runs
    * on a web crawl. Spec-visible so the DuckDB oracle can apply the
    * IDENTICAL chain.
    */
  val HtmlBoilerplateRes: Seq[String] = Seq(
    "script", "style", "nav", "header", "footer", "aside").map(tag =>
    // (?i): HTML tag names are case-insensitive (<SCRIPT> is legal and
    // common in real crawls). (\\s[^>]*)? instead of [^>]*: the open tag
    // must END at the name or continue with whitespace-led attributes, so
    // unrelated tags sharing the prefix (<scripty>) don't match. The close
    // tag tolerates trailing whitespace (</script >). No lookarounds — the
    // pattern stays in the Java ∩ RE2 common dialect.
    s"(?is)<$tag(\\s[^>]*)?>.*?</$tag\\s*>")

  /** Generic tag pattern for the post-block strip. */
  val HtmlTagRe = "<[^>]+>"

  /** MAIN-CONTENT extraction from an HTML column — the first operator a
    * web-crawl curation pipeline runs: drop the boilerplate blocks
    * (script/style/nav/header/footer/aside, bodies included), strip the
    * remaining tags, collapse whitespace runs, trim. Pure codegen'd
    * string expressions — one projection, no shuffle, streaming-safe.
    * (A full extractor also scores text density per DOM block; the block
    * list is the load-bearing part a regex pipeline can do exactly.)
    */
  def stripHtmlBoilerplate(html: Column): Column = {
    val noBlocks = HtmlBoilerplateRes.foldLeft(html)(
      (c, re) => regexp_replace(c, re, " "))
    trim(regexp_replace(regexp_replace(noBlocks, HtmlTagRe, " "), "\\s+", " "))
  }

  /** URL CANONICALIZATION for dedup/linkage — the normalizations that make
    * syntactically-different URLs of the same resource compare equal:
    * scheme and host lowercased, `www.`-prefix and default ports (:80/:443)
    * dropped, the fragment dropped, `utm_*` tracking params dropped (with
    * their separator healed), the trailing path slash stripped. All
    * Java ∩ RE2 regex + string builtins, so a DuckDB oracle reproduces the
    * result (replacement backrefs are `$1` here, `\\1` there — the one
    * dialect seam, isolated to the oracle text). The utm strip runs its
    * leading-separator form twice: global replace does not rescan
    * replacement output, so each pass heals one adjacency of consecutive
    * utm params (two passes cover the ≤3-adjacent real-world case).
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    // host ends at the FIRST of /?# — a path-less URL's query or fragment
    // (https://example.com?utm_source=x, https://example.com#frag) must not
    // be absorbed into the host, where it would be case-folded and escape
    // the utm/fragment normalizations below
    val host = lower(regexp_extract(url, "(?i)^[a-z]+://([^/?#]+)", 1))
    val hostNorm = regexp_replace(
      regexp_replace(host, "^www[0-9]*\\.", ""), ":(443|80)$", "")
    val rest = regexp_extract(url, "(?i)^[a-z]+://[^/?#]+([^#]*)", 1)
    val dropUtmMid = (c: Column) =>
      regexp_replace(c, "([?&])utm_[A-Za-z]+=[^&]*&", "$1")
    val noUtm = regexp_replace(
      dropUtmMid(dropUtmMid(rest)), "[?&]utm_[A-Za-z]+=[^&]*$", "")
    val noSlash = regexp_replace(
      regexp_replace(regexp_replace(noUtm, "/\\?", "?"), "/$", ""), "\\?$", "")
    concat(scheme, lit("://"), hostNorm, noSlash)
  }

  /** GOPHER-STYLE REPETITION SIGNALS — the excess-repetition filters
    * web-scale curation pipelines (Gopher rules, RefinedWeb, Dolma) cut
    * boilerplate and spam with: per document, the most-frequent word /
    * adjacent-bigram / adjacent-trigram concentration, the fraction of
    * tokens inside repeated words, and the distinct-token ratio, all as
    * exact ×10⁶ integer parts-per-million plus a pass/fail gate at the
    * given thresholds. Scale shape: three explode→(doc, gram)
    * hash-aggregates re-aggregated to doc grain and joined on doc_id —
    * partial aggregation map-side, no window, no self-join, never a
    * corpus² anywhere; the n-gram comprehension is a per-row projection
    * (the q173 shape). All compared outputs are integers/booleans.
    */
  def repetitionSignals(docs: DataFrame,
      maxTopWordPpm: Long = 300000L, maxTopBigramPpm: Long = 200000L,
      maxTopTrigramPpm: Long = 150000L, maxDupWordPpm: Long = 600000L)
      : DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val words = base.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        max("c").as("top_word_c"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_word_c"),
        count(lit(1)).as("distinct_words"))
    def topGram(k: Int, outCol: String): DataFrame = {
      val parts = (0 until k).map(j => s"t[i-${k - 1 - j}]").mkString(", ' ', ")
      base.select(col("doc_id"), explode(expr(
        s"transform(sequence(${k - 1}, size(t) - 1), i -> concat($parts))"))
        .as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as(outCol))
    }
    words
      .join(topGram(2, "top_bigram_c"), "doc_id")
      .join(topGram(3, "top_trigram_c"), "doc_id")
      .select(col("doc_id"), col("n_words"), col("distinct_words"),
        col("top_word_c"), col("top_bigram_c"), col("top_trigram_c"),
        col("dup_word_c"),
        expr("top_word_c * 1000000 div n_words").as("top_word_ppm"),
        expr("top_bigram_c * 1000000 div (n_words - 1)").as("top_bigram_ppm"),
        expr("top_trigram_c * 1000000 div (n_words - 2)").as("top_trigram_ppm"),
        expr("dup_word_c * 1000000 div n_words").as("dup_word_ppm"),
        expr("distinct_words * 1000000 div n_words").as("distinct_ppm"))
      .withColumn("gopher_pass",
        col("top_word_ppm") <= maxTopWordPpm &&
          col("top_bigram_ppm") <= maxTopBigramPpm &&
          col("top_trigram_ppm") <= maxTopTrigramPpm &&
          col("dup_word_ppm") <= maxDupWordPpm)
  }
}
