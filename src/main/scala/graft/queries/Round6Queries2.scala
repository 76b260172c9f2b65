package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Det
import graft.operators.{Ranks, TextAnalysis}

/** Round-6 surface, second tranche: MODEL-EVALUATION metrics as corpus-scale
  * queries (calibration/ECE, chance-corrected agreement), collocation mining
  * (PMI), keyword search scoring (BM25), a Zipf power-law fit, and robust
  * per-group outlier detection (median/MAD) on the distributed-selection
  * operator. Determinism protocol: every compared ratio is either produced by
  * [[graft.functions.Det.ihalfUp]] (pure integer arithmetic end to end — no
  * double and no DECIMAL→DOUBLE cast anywhere) or is a libm-stable ln() of
  * exact integer ratios under rdet6 rounding (the q140 protocol).
  */
object Round6Queries2 {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  private val markersSql: Map[String, String] =
    TextAnalysis.LangMarkers.toMap.map { case (l, ms) =>
      l -> ms.map(m => s"'$m'").mkString("(", ", ", ")")
    }

  /** The q30/q170 quality-score CTE chain (`w0` → `qual(doc_id, n_chars, s)`),
    * shared by the calibration query.
    */
  private val qualCte: String = s"""
      w0 AS (SELECT doc_id, n_chars, text, string_split(text, ' ') AS w
             FROM documents),
      qual AS (SELECT doc_id, n_chars,
                 0.5e0 * stopword_ratio
                   + 0.3e0 * least(avg_token_len / 10.0e0, 1.0e0)
                   + 0.2e0 * least(CAST(n_tokens AS DOUBLE) / 100.0e0, 1.0e0) AS s
               FROM (
                 SELECT doc_id, n_chars,
                        CAST(len(w) AS BIGINT) AS n_tokens,
                        (CAST(length(text) AS DOUBLE)
                          - CAST(len(w) AS BIGINT) + 1.0e0)
                          / CAST(len(w) AS BIGINT) AS avg_token_len,
                        CAST(CAST(len(list_filter(w, t -> t IN ${markersSql("en")})) AS BIGINT) AS DOUBLE)
                          / CAST(len(w) AS BIGINT) AS stopword_ratio
                 FROM w0))"""

  /** The q169 language-ID CTE chain (`scored` → `pred(doc_id, lang,
    * pred_lang)`), shared by the agreement query.
    */
  private val predCte: String = s"""
      scored AS (
        SELECT doc_id, lang,
          ${TextAnalysis.LangMarkers.map { case (l, _) =>
            s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${markersSql(l)})) AS BIGINT) AS s_$l"
          }.mkString(",\n          ")}
        FROM documents),
      pred AS (SELECT doc_id, lang,
                 CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                      WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                      WHEN s_de >= s_es THEN 'de'
                      ELSE 'es' END AS pred_lang
               FROM scored)"""

  /** CALIBRATION of a probabilistic scorer — the reliability diagram plus
    * ECE and Brier score, the standard "is the model's confidence honest"
    * eval: the q30 quality score read as P(doc is long), 10 equal-width
    * confidence bins, and per bin the mean confidence, empirical accuracy,
    * |gap|, and Brier contribution; a final bin=-1 row carries the corpus
    * totals where gap_e6 IS the expected calibration error. Every output
    * number is produced by integer-only arithmetic: scores are ×10⁶-scaled
    * longs the moment they leave the (bit-reproducible, libm-free) quality
    * expression, bins and all four ratios come from [[Det.ihalfUp]], and the
    * squared Brier terms accumulate in DECIMAL(38,0)/HUGEINT — zero doubles
    * in any compared value, so no engine canonicalization can diverge. Scale
    * shape: one narrow projection per doc, ONE 10-row hash aggregate, and a
    * 10-row re-aggregate for the total — model calibration at 100 TB costs
    * exactly one pass, and the per-bin sums are mergeable partial-agg state.
    */
  val q171Calibration: QueryDef = QueryDef(
    "q171_calibration",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), Det.rdetLong(col("quality"), 6).as("si"))
        .join(docs.select(col("doc_id"),
          when(col("n_chars") >= 300, 1L).otherwise(0L).as("y")), "doc_id")
        .withColumn("bin", least(floor(col("si") / 100000).cast("long"), lit(9L)))
      val per = scored.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(col("si")).as("s_sum"),
        sum(dec((col("si") - col("y") * 1000000L)
          * (col("si") - col("y") * 1000000L))).as("sq"))
      val binRows = per.select(
        col("bin"), col("n"), col("n_pos"),
        Det.ihalfUp(col("s_sum"), col("n")).as("conf_e6"),
        Det.ihalfUp(col("n_pos") * 1000000L, col("n")).as("acc_e6"),
        Det.ihalfUp(abs(col("n_pos") * 1000000L - col("s_sum")), col("n")).as("gap_e6"),
        Det.ihalfUp(col("sq"), dec(col("n") * 1000000L)).as("brier_e6"))
      val total = per.agg(
          sum(col("n")).as("tn"), sum(col("n_pos")).as("tp"),
          sum(col("s_sum")).as("ts"), sum(col("sq")).as("tsq"),
          sum(abs(col("n_pos") * 1000000L - col("s_sum"))).as("tgap"))
        .select(lit(-1L).as("bin"), col("tn").as("n"), col("tp").as("n_pos"),
          Det.ihalfUp(col("ts"), col("tn")).as("conf_e6"),
          Det.ihalfUp(col("tp") * 1000000L, col("tn")).as("acc_e6"),
          Det.ihalfUp(col("tgap"), col("tn")).as("gap_e6"),
          Det.ihalfUp(col("tsq"), dec(col("tn") * 1000000L)).as("brier_e6"))
      binRows.unionByName(total).orderBy("bin")
    },
    Some(s"""
      WITH ${qualCte},
      si AS (SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
                    ${Det.rdetLongSql("s", 6)} AS si
             FROM qual),
      b AS (SELECT y, si, CAST(least(si // 100000, 9) AS BIGINT) AS bin FROM si),
      per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                     CAST(SUM(y) AS BIGINT) AS n_pos,
                     CAST(SUM(si) AS BIGINT) AS s_sum,
                     SUM((si - y*1000000)*(si - y*1000000)) AS sq
              FROM b GROUP BY 1),
      rows_ AS (
        SELECT bin, n, n_pos,
               ${Det.ihalfUpSql("s_sum", "n")} AS conf_e6,
               ${Det.ihalfUpSql("n_pos*1000000", "n")} AS acc_e6,
               ${Det.ihalfUpSql("abs(n_pos*1000000 - s_sum)", "n")} AS gap_e6,
               ${Det.ihalfUpSql("sq", "n*1000000")} AS brier_e6
        FROM per
        UNION ALL
        SELECT -1 AS bin, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(n_pos) AS BIGINT) AS n_pos,
               ${Det.ihalfUpSql("SUM(s_sum)", "SUM(n)")} AS conf_e6,
               ${Det.ihalfUpSql("SUM(n_pos)*1000000", "SUM(n)")} AS acc_e6,
               ${Det.ihalfUpSql("SUM(abs(n_pos*1000000 - s_sum))", "SUM(n)")} AS gap_e6,
               ${Det.ihalfUpSql("SUM(sq)", "SUM(n)*1000000")} AS brier_e6
        FROM per)
      SELECT * FROM rows_ ORDER BY bin"""))

  /** COHEN'S KAPPA — chance-corrected agreement between the q29 language-ID
    * heuristic and the labeled `lang` column, the companion number to q169's
    * raw precision/recall (observed agreement means nothing when one class
    * dominates; kappa subtracts the margin-product chance rate). Computed
    * entirely from the confusion matrix's integer margins via the identity
    * kappa = (T·N − Σ nt·np)/(N² − Σ nt·np): numerator and denominator are
    * exact DECIMAL(38,0)/HUGEINT products of counts and the single rounding
    * is [[Det.ihalfUpSigned]] — no doubles. On this fixture the classifier
    * collapses to 'en', so kappa is exactly 0 (agreement = chance) — the
    * honest number q169's precision 0.436 obscures. Scale: one (label, pred)
    * hash aggregate (≤ classes² rows) and class-count arithmetic; the
    * classifier itself is a scan-side projection.
    */
  val q172CohenKappa: QueryDef = QueryDef(
    "q172_cohen_kappa",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pred = TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang"))
      val conf = docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      val nt = conf.groupBy(col("lang").as("cls")).agg(sum("n").as("nt"))
      val np = conf.groupBy(col("pred_lang").as("cls")).agg(sum("n").as("np"))
      val m = nt.join(np, Seq("cls"), "full_outer").na.fill(0L, Seq("nt", "np"))
      val tSum = conf.filter(col("lang") === col("pred_lang"))
        .agg(coalesce(sum("n"), lit(0L)).as("t"))
      val g = m.agg(sum(col("nt")).as("bign"), sum(dec(col("nt")) * dec(col("np"))).as("s"))
      g.crossJoin(tSum).select(
        col("bign").as("n"),
        Det.ihalfUp(col("t") * 1000000L, col("bign")).as("po_e6"),
        Det.ihalfUp(col("s") * 1000000L, dec(col("bign")) * dec(col("bign"))).as("pe_e6"),
        when(dec(col("bign")) * dec(col("bign")) - col("s") === 0, 0L)
          .otherwise(Det.ihalfUpSigned(
            (dec(col("t")) * dec(col("bign")) - col("s")) * 1000000L,
            dec(col("bign")) * dec(col("bign")) - col("s"))).as("kappa_e6"))
    },
    Some(s"""
      WITH ${predCte},
      conf AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
               FROM pred GROUP BY 1, 2),
      nt AS (SELECT lang AS cls, SUM(n) AS nt FROM conf GROUP BY 1),
      np AS (SELECT pred_lang AS cls, SUM(n) AS np FROM conf GROUP BY 1),
      m AS (SELECT COALESCE(nt.nt, 0) AS nt, COALESCE(np.np, 0) AS np
            FROM nt FULL OUTER JOIN np ON nt.cls = np.cls),
      tt AS (SELECT COALESCE(SUM(n), 0) AS t FROM conf WHERE lang = pred_lang),
      g AS (SELECT SUM(nt) AS bign, SUM(nt*np) AS s FROM m)
      SELECT CAST(bign AS BIGINT) AS n,
             ${Det.ihalfUpSql("t*1000000", "bign")} AS po_e6,
             ${Det.ihalfUpSql("s*1000000", "bign*bign")} AS pe_e6,
             CASE WHEN bign*bign - s = 0 THEN CAST(0 AS BIGINT)
                  ELSE ${Det.ihalfUpSignedSql("(t*bign - s)*1000000", "bign*bign - s")}
             END AS kappa_e6
      FROM g, tt"""))

  /** PMI COLLOCATIONS — pointwise mutual information over adjacent token
    * pairs, the classic "which word pairs co-occur more than chance" mining
    * pass (phrase detection for tokenizer vocab construction). pmi =
    * ln(P(w1,w2)/(P(w1)·P(w2))) computed as one ln() of a ratio of exact
    * counts (identical expression tree both engines; ln is libm-stable under
    * the rdet6 protocol), support-filtered at c12 ≥ 5. Scale shape: one
    * token explode feeding two hash aggregates (unigram + bigram counts);
    * the unigram relation is vocabulary-sized, so both count lookups are
    * BROADCAST joins onto the bigram table and the totals are one-row
    * cross-joins — no shuffle ever carries more than the bigram vocabulary.
    */
  val q173PmiCollocations: QueryDef = QueryDef(
    "q173_pmi_collocations",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val ts = split(col("text"), " ")
      val uni = docs.select(explode(ts).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val t1 = uni.agg(sum(col("c1")).as("t1"))
      val bi = docs.select(ts.as("t")).filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val t2 = bi.agg(count(lit(1)).as("t2"))
      val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= 5)
      big
        .join(broadcast(uni.select(col("w").as("w1"), col("c1").as("ca"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("cb"))), "w2")
        .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
        .select(col("w1"), col("w2"), col("c12"),
          Det.rdetLong(log((col("c12").cast("double") * col("t1") * col("t1"))
            / (col("t2").cast("double") * col("ca") * col("cb"))), 6).as("pmi_e6"))
        .orderBy("w1", "w2")
    },
    Some(s"""
      WITH w0 AS (SELECT string_split(text, ' ') AS w FROM documents),
      tok AS (SELECT unnest(w) AS t FROM w0),
      uni AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
      t1 AS (SELECT SUM(c) AS t1 FROM uni),
      bg AS (SELECT w[k] AS w1, w[k+1] AS w2
             FROM w0, unnest(range(1, len(w))) u(k)),
      t2 AS (SELECT CAST(count(*) AS BIGINT) AS t2 FROM bg),
      big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
              FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT w1, w2, c12,
             ${Det.rdetLongSql(
               """ln((CAST(c12 AS DOUBLE) * t1 * t1)
                  / (CAST(t2 AS DOUBLE) * a.c * b.c))""", 6)} AS pmi_e6
      FROM big JOIN uni a ON big.w1 = a.w
               JOIN uni b ON big.w2 = b.w, t1, t2
      ORDER BY w1, w2"""))

  /** BM25 KEYWORD SEARCH — the Okapi ranking function (k1=1.2, b=0.75) for a
    * fixed 3-term query over the corpus, top-50 by score: the retrieval
    * pass of any search/RAG pipeline run as a relational query. The rare
    * term ('dup', df ≈ 1% of docs) dominates via idf while the common terms
    * contribute through tf saturation — both halves of the formula are
    * exercised. Scale shape: per-doc term frequencies are ARRAY-FILTER
    * projections in the scan (no explode, no shuffle — the query terms are a
    * compile-time set); the corpus statistics (N, Σdl, per-term df) are ONE
    * scalar aggregate broadcast back; ranking is a top-k sort on the scaled
    * integer score with doc_id tiebreak. Score doubles share one expression
    * tree with the oracle (ln is rdet6-stable), emitted ×10⁶ as longs.
    */
  val q174Bm25: QueryDef = QueryDef(
    "q174_bm25_search",
    (s, dir) => {
      val terms = Seq("dup", "hash", "spark")
      val ts = split(col("text"), " ")
      val base = Tables.load(s, dir, "documents").select(
        col("doc_id") +: size(ts).cast("long").as("dl") +:
          terms.map(t => size(filter(ts, x => x === t)).cast("long").as(s"tf_$t")): _*)
      val g = base.agg(
        count(lit(1)).as("nn"),
        sum(col("dl")).as("sdl") +:
          terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
      val avgdl = col("sdl").cast("double") / col("nn")
      def idf(t: String): Column =
        log((col("nn") - col(s"df_$t") + lit(0.5d)) / (col(s"df_$t") + lit(0.5d)) + lit(1.0d))
      def part(t: String): Column =
        when(col(s"tf_$t") > 0,
          idf(t) * (col(s"tf_$t") * lit(2.2d))
            / (col(s"tf_$t") + lit(1.2d) * (lit(0.25d) + lit(0.75d) * col("dl") / avgdl)))
          .otherwise(lit(0.0d))
      base.crossJoin(broadcast(g))
        .select(col("doc_id"), col("dl"),
          col("tf_dup"), col("tf_hash"), col("tf_spark"),
          Det.rdetLong(part("dup") + part("hash") + part("spark"), 6).as("score_e6"))
        .orderBy(col("score_e6").desc, col("doc_id"))
        .limit(50)
    },
    Some {
      val terms = Seq("dup", "hash", "spark")
      val tfDefs = terms.map(t =>
        s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n             ")
      val dfDefs = terms.map(t =>
        s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n             ")
      def partSql(t: String): String =
        s"""CASE WHEN tf_$t > 0 THEN
           | ln((nn - df_$t + 0.5e0) / (df_$t + 0.5e0) + 1.0e0)
           |   * (tf_$t * 2.2e0)
           |   / (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * dl / (CAST(sdl AS DOUBLE) / nn)))
           | ELSE 0.0e0 END""".stripMargin.replace("\n", " ")
      s"""
      WITH base AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
             $tfDefs
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      g AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(SUM(dl) AS BIGINT) AS sdl,
             $dfDefs
            FROM base)
      SELECT doc_id, dl, tf_dup, tf_hash, tf_spark,
             ${Det.rdetLongSql(
               s"${partSql("dup")} + ${partSql("hash")} + ${partSql("spark")}", 6)}
               AS score_e6
      FROM base, g
      ORDER BY score_e6 DESC, doc_id
      LIMIT 50"""
    })

  /** ZIPF POWER-LAW FIT — least-squares slope of ln(frequency) against
    * ln(rank) over the token frequency table: the corpus-health diagnostic
    * (natural text ≈ −1; this synthetic fixture's near-uniform vocabulary
    * fits ≈ −0.04 with the one rare token pulling the tail — the fit
    * DETECTS the unnaturalness, which is its job). Ranking uses
    * [[Ranks.globalRowNumber]] — the bucketed distributed rank, no
    * single-partition window even when the vocabulary is millions of
    * tokens. Determinism: ln() is rdet6-rounded to ×10⁶ longs at the
    * leaves; all four moments accumulate exactly (DECIMAL(38,0)/HUGEINT);
    * the slope is one [[Det.ihalfUpSigned]] integer division, and only the
    * intercept's final combination touches doubles (exact int64-range
    * inputs). Scale: token aggregate → vocab-sized rank + 5-number moment
    * reduce; nothing after the first aggregate exceeds the vocabulary.
    */
  val q175ZipfSlope: QueryDef = QueryDef(
    "q175_zipf_slope",
    (s, dir) => {
      val uni = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val ranked = Ranks.globalRowNumber(uni, Seq(-col("cnt"), col("w")), "rank")
      val mom = ranked.select(
          Det.rdetLong(log(col("rank")), 6).as("x"),
          Det.rdetLong(log(col("cnt")), 6).as("y"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"))
      val num = (dec(col("n")) * col("sxy") - col("sx") * col("sy")) * 1000000L
      val den = dec(col("n")) * col("sxx") - col("sx") * col("sx")
      val slope = mom.select(col("n").as("n_vocab"), col("sx"), col("sy"),
        when(den === 0, 0L).otherwise(Det.ihalfUpSigned(num, den)).as("slope_e6"))
      slope.select(col("n_vocab"), col("slope_e6"),
        Det.rdetLong(
          col("sy").cast("double") / col("n_vocab")
            - (col("slope_e6").cast("double") / lit(1000000.0d))
              * (col("sx").cast("double") / col("n_vocab")), 6).as("intercept_e6"))
    },
    Some(s"""
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      uni AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
      r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM uni),
      xy AS (SELECT ${Det.rdetLongSql("ln(rank)", 6)} AS x,
                    ${Det.rdetLongSql("ln(cnt)", 6)} AS y FROM r),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM xy),
      m2 AS (SELECT n AS n_vocab, sx, sy,
               CASE WHEN n*sxx - sx*sx = 0 THEN CAST(0 AS BIGINT)
                    ELSE ${Det.ihalfUpSignedSql("(n*sxy - sx*sy)*1000000", "n*sxx - sx*sx")}
               END AS slope_e6
             FROM m)
      SELECT n_vocab, slope_e6,
             ${Det.rdetLongSql(
               """CAST(sy AS DOUBLE) / n_vocab
                  - (CAST(slope_e6 AS DOUBLE) / 1000000.0e0)
                    * (CAST(sx AS DOUBLE) / n_vocab)""", 6)} AS intercept_e6
      FROM m2"""))

  /** MEDIAN/MAD OUTLIER detection per group — the robust anomaly pass
    * (means and stddevs are themselves corrupted by the outliers they
    * should find; median ± k·MAD is not): per source, the exact lower
    * median of doc length, the median absolute deviation around it, and the
    * count of docs beyond 5·MAD. BOTH medians are
    * [[Ranks.selectByRank]] — the bucketed distributed selection, so a
    * source with a billion docs never funnels through one task (the q41
    * single-reducer percentile trap this operator family exists to avoid);
    * everything else is two equi-joins of the per-source constants back to
    * the data and one count aggregate. All values integer end to end —
    * lower-median of integers is an integer (matches DuckDB
    * quantile_disc(0.5) exactly), so there is nothing to round.
    */
  val q176MadOutliers: QueryDef = QueryDef(
    "q176_mad_outliers",
    (s, dir) => {
      val lowerMedian = (n: Column) => ((n + lit(1L)) / 2).cast("long")
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("x"))
      val med = Ranks.selectByRank(d, Seq(col("source")),
          Seq(col("x"), col("doc_id")), lowerMedian, "mr")
        .select(col("source"), col("x").as("med"))
      val wd = d.join(med, "source").withColumn("dev", abs(col("x") - col("med")))
      val mad = Ranks.selectByRank(wd, Seq(col("source")),
          Seq(col("dev"), col("doc_id")), lowerMedian, "dr")
        .select(col("source"), col("dev").as("mad"))
      wd.join(mad, "source").groupBy("source").agg(
          count(lit(1)).as("n"),
          min(col("med")).as("med"),
          min(col("mad")).as("mad"),
          sum(when(col("dev") > col("mad") * 5, 1L).otherwise(0L)).as("n_out"))
        .orderBy("source")
    },
    Some("""
      WITH d AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x
                 FROM documents),
      med AS (SELECT source, CAST(quantile_disc(x, 0.5) AS BIGINT) AS med
              FROM d GROUP BY 1),
      wd AS (SELECT d.source, x, med, abs(x - med) AS dev
             FROM d JOIN med USING (source)),
      mad AS (SELECT source, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
              FROM wd GROUP BY 1)
      SELECT wd.source, CAST(count(*) AS BIGINT) AS n,
             min(wd.med) AS med, min(mad.mad) AS mad,
             CAST(SUM(CASE WHEN dev > 5*mad.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out
      FROM wd JOIN mad USING (source)
      GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(
    q171Calibration, q172CohenKappa, q173PmiCollocations, q174Bm25,
    q175ZipfSlope, q176MadOutliers)
}
