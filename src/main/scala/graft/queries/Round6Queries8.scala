package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Det
import graft.operators.Ranks

/** Round-6 surface, eighth tranche: distribution-drift testing (two-sample
  * Kolmogorov–Smirnov on the distributed cumulative sum), feature-evaluation
  * binning (WOE / information value), and day-of-week deseasonalized volume
  * screening — the statistical monitoring a corpus pipeline runs between
  * ingests.
  */
object Round6Queries8 {
  private val D38 = DecimalType(38, 0)

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST — "did the `click` value
    * distribution drift from `view`?", the canonical nonparametric check
    * between two corpus slices. D = sup|F_a − F_b| is evaluated exactly at
    * every distinct value: one hash aggregate collapses both slices to the
    * (value, count_a, count_b) relation, [[Ranks.globalCumSum]] turns that
    * into both empirical CDFs WITHOUT an unpartitioned window (per-bucket
    * cumsums + broadcast bucket offsets — the cumulative never funnels
    * through one task however many distinct values exist), and the sup runs
    * as a plain max over |cum_a·n_b − cum_b·n_a| — CDFs cross-multiplied so
    * every comparison is an exact integer (DECIMAL(38,0)/HUGEINT: the
    * products pass int64 once each slice exceeds ~3·10⁹ rows); the only
    * division is the final half-up ÷ to D in ppm. Also reports the critical-value scaled
    * statistic λ = D·√(n_a·n_b/(n_a+n_b)) (×10⁶, leaf-rounded) — reject at
    * α=0.05 when λ > 1.358.
    */
  val q192KsDrift: QueryDef = QueryDef(
    "q192_ks_drift",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
      // cache: the cell relation feeds the totals agg and globalCumSum's
      // three passes (extremes, bucket offsets, windows) — protocol #6
      val cells = ev.groupBy("v_c").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("cb"))
        .transform(graft.operators.ScopedCache.cache)
      val cum = Ranks.globalCumSum(cells, Seq(col("v_c")),
        Seq(col("ca") -> "cum_a", col("cb") -> "cum_b"))
      val tot = cells.agg(sum("ca").as("na"), sum("cb").as("nb"),
        count(lit(1)).as("n_values"))
      val d = cum.crossJoin(broadcast(tot))
        .select(abs(col("cum_a").cast(D38) * col("nb").cast(D38)
          - col("cum_b").cast(D38) * col("na").cast(D38)).as("d"))
        .agg(max("d").as("dmax"))
      d.crossJoin(broadcast(tot)).select(
        col("na"), col("nb"), col("n_values"),
        Det.ihalfUp(col("dmax").cast(D38) * lit(1000000L).cast(D38),
          col("na").cast(D38) * col("nb").cast(D38)).as("ks_ppm"),
        Det.rdetLong(
          (col("dmax").cast("double") / (col("na").cast("double") * col("nb")))
            * sqrt(col("na").cast("double") * col("nb")
              / (col("na") + col("nb"))), 6).as("lambda_e6"))
    },
    Some(s"""
      WITH ev AS (SELECT event_type,
                         CAST(floor(value * 100 + 0.5e0) AS BIGINT) AS v_c
                  FROM events WHERE event_type IN ('click', 'view')),
      cells AS (SELECT v_c,
                       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                         AS BIGINT) AS ca,
                       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                         AS BIGINT) AS cb
                FROM ev GROUP BY 1),
      cum AS (SELECT v_c,
                     sum(ca) OVER (ORDER BY v_c ROWS UNBOUNDED PRECEDING)
                       AS cum_a,
                     sum(cb) OVER (ORDER BY v_c ROWS UNBOUNDED PRECEDING)
                       AS cum_b
              FROM cells),
      tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                     CAST(sum(cb) AS BIGINT) AS nb,
                     CAST(count(*) AS BIGINT) AS n_values
              FROM cells),
      d AS (SELECT max(abs(CAST(cum_a AS HUGEINT) * nb
                           - CAST(cum_b AS HUGEINT) * na)) AS dmax
            FROM cum CROSS JOIN tot)
      SELECT na, nb, n_values,
             ${Det.ihalfUpSql("dmax * 1000000", "CAST(na AS HUGEINT) * nb")} AS ks_ppm,
             ${Det.rdetLongSql(
        """(CAST(dmax AS DOUBLE) / (CAST(na AS DOUBLE) * nb))
           * sqrt(CAST(na AS DOUBLE) * nb / (na + nb))""", 6)} AS lambda_e6
      FROM d CROSS JOIN tot"""))

  /** WEIGHT-OF-EVIDENCE / INFORMATION-VALUE feature binning — "how well
    * does document length separate English from non-English", the standard
    * feature-screening statistic. Documents fall into 10 equal-frequency
    * bins via [[Ranks.globalNtile]] (distributed ntile — never a
    * single-task window; the oracle's `ntile(10) OVER (ORDER BY ...)`
    * shares the exact SQL tile convention); per bin, WOE = ln of the
    * smoothed odds ratio ((2g+1)(2B+10))/((2b+1)(2G+10)) — an exact-int64
    * product ratio, ln rounded to a ×10⁶ long at the leaf — and the IV
    * term (g/G − b/B)·WOE lands by exact cross-multiplied half-up division.
    * A bin=0 totals row carries the summed IV: > 0.3 ⇒ strong predictor.
    * One rank pass + one 10-row aggregate; nothing after the binning
    * exceeds 10 rows.
    */
  val q193WoeBinning: QueryDef = QueryDef(
    "q193_woe_binning",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          when(col("lang") === "en", 1L).otherwise(0L).as("good"))
      val binned = Ranks.globalNtile(docs,
        Seq(col("n_chars"), col("doc_id")), 10, "bin")
      val bins = binned.groupBy("bin").agg(
        count(lit(1)).as("n"), sum("good").as("g"),
        (count(lit(1)) - sum("good")).as("b"))
      val tot = bins.agg(sum("g").as("gt"), sum("b").as("bt"))
      // cache: the terms relation (10 rows, but sitting atop the corpus
      // rank pass) feeds both union branches — protocol #6
      val terms = bins.crossJoin(broadcast(tot))
        .withColumn("woe_e6", Det.rdetLong(log(
          ((col("g") * 2 + 1).cast("double") * (col("bt") * 2 + 10).cast("double"))
            / ((col("b") * 2 + 1).cast("double")
              * (col("gt") * 2 + 10).cast("double"))), 6))
        // D38 before the products: g·bt and the ×woe_e6 numerator cross
        // int64 near 1e6 good × 1e6 bad docs, where Spark (non-ANSI)
        // would wrap silently while the oracle's HUGEINT keeps going —
        // the same route q192/q195 already take for cross-products
        .withColumn("iv_term_e6", Det.ihalfUpSigned(
          (col("g").cast(D38) * col("bt") - col("b").cast(D38) * col("gt"))
            * col("woe_e6"),
          col("gt").cast(D38) * col("bt")))
        .select(col("bin").cast("long").as("bin"), col("n"), col("g"),
          col("b"), col("woe_e6"), col("iv_term_e6"))
        .transform(graft.operators.ScopedCache.cache)
      val total = terms.agg(sum("n").as("n"), sum("g").as("g"),
          sum("b").as("b"), sum("iv_term_e6").as("iv_term_e6"))
        .select(lit(0L).as("bin"), col("n"), col("g"), col("b"),
          lit(0L).as("woe_e6"), col("iv_term_e6"))
      terms.unionByName(total).orderBy("bin")
    },
    Some(s"""
      WITH docs AS (SELECT doc_id, n_chars,
                           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS good
                    FROM documents),
      binned AS (SELECT *, ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
                 FROM docs),
      bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(good) AS BIGINT) AS g,
                      CAST(count(*) - sum(good) AS BIGINT) AS b
               FROM binned GROUP BY 1),
      tot AS (SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt
              FROM bins),
      terms AS (SELECT bin, n, g, b,
                       ${Det.rdetLongSql(
        """ln((CAST(g*2 + 1 AS DOUBLE) * (bt*2 + 10))
            / (CAST(b*2 + 1 AS DOUBLE) * (gt*2 + 10)))""", 6)} AS woe_e6
                FROM bins CROSS JOIN tot),
      iv AS (SELECT t.bin, t.n, t.g, t.b, t.woe_e6,
                    ${Det.ihalfUpSignedSql(
        "(CAST(t.g AS HUGEINT) * tot.bt - CAST(t.b AS HUGEINT) * tot.gt) * t.woe_e6",
        "CAST(tot.gt AS HUGEINT) * tot.bt")}
                      AS iv_term_e6
             FROM terms t CROSS JOIN tot)
      SELECT CAST(bin AS BIGINT) AS bin, n, g, b, woe_e6, iv_term_e6
      FROM (SELECT * FROM iv
            UNION ALL
            SELECT 0, CAST(sum(n) AS BIGINT), CAST(sum(g) AS BIGINT),
                   CAST(sum(b) AS BIGINT), CAST(0 AS BIGINT),
                   CAST(sum(iv_term_e6) AS BIGINT)
            FROM iv)
      ORDER BY bin"""))

  /** DAY-OF-WEEK DESEASONALIZED VOLUME SCREEN — the q183 drift check with
    * the weekly cycle removed: each (event type, day)'s count is compared
    * to that type's SAME-WEEKDAY mean, so a quiet Sunday never false-alarms
    * against a Monday baseline. Relative deviation is exact cross-multiplied
    * integer arithmetic (x·c_td − s_td over s_td, half-up to ppm; the mean
    * never becomes a fraction); a day is anomalous at |deviation| > 50%.
    * Per type: days observed, anomalous days, and the peak |deviation| day
    * (first such day on ties). The fact table is touched by ONE aggregate
    * to the (type, day) grain; the weekday baselines are a 7×types
    * re-aggregate broadcast back.
    */
  val q194SeasonalScreen: QueryDef = QueryDef(
    "q194_seasonal_screen",
    (s, dir) => {
      // cache: the one fact aggregate feeds the baseline re-agg AND the
      // deviation join — the events table is scanned exactly once
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("dow", dayofweek(col("day")) - 1)
        .transform(graft.operators.ScopedCache.cache)
      val base = daily.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("c"), sum("x").as("sm"))
      // cache: dev (day-grain, small) sits atop the events aggregate and
      // feeds three consumers (peak, peak-day, output agg) — protocol #6
      val dev = daily.join(broadcast(base), Seq("event_type", "dow"))
        .withColumn("dev_ppm", Det.ihalfUpSigned(
          (col("x") * col("c") - col("sm")) * 1000000L, col("sm")))
        .transform(graft.operators.ScopedCache.cache)
      val peak = dev
        .groupBy("event_type").agg(max(abs(col("dev_ppm"))).as("peak_abs"))
      val peakDay = dev.join(peak, "event_type")
        .filter(abs(col("dev_ppm")) === col("peak_abs"))
        .groupBy("event_type").agg(min("day").as("peak_day"))
      dev.groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          sum(when(abs(col("dev_ppm")) > 500000L, 1L).otherwise(0L))
            .as("n_anomalous"))
        .join(peak, "event_type").join(peakDay, "event_type")
        .select(col("event_type"), col("n_days"), col("n_anomalous"),
          col("peak_abs").as("peak_dev_ppm"), col("peak_day"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS x,
                            dayofweek(CAST(ts AS DATE)) AS dow
                     FROM events GROUP BY 1, 2, 4),
      base AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS c,
                      CAST(sum(x) AS BIGINT) AS sm
               FROM daily GROUP BY 1, 2),
      dev AS (SELECT d.event_type, d.day,
                     ${Det.ihalfUpSignedSql("(d.x * b.c - b.sm) * 1000000",
        "b.sm")} AS dev_ppm
              FROM daily d JOIN base b
                ON d.event_type = b.event_type AND d.dow = b.dow),
      pk AS (SELECT event_type, max(abs(dev_ppm)) AS peak_abs
             FROM dev GROUP BY 1),
      pkday AS (SELECT dev.event_type, min(day) AS peak_day
                FROM dev JOIN pk ON dev.event_type = pk.event_type
                              AND abs(dev.dev_ppm) = pk.peak_abs
                GROUP BY 1)
      SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN abs(dev_ppm) > 500000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_anomalous,
             pk.peak_abs AS peak_dev_ppm, pkday.peak_day
      FROM dev d
      JOIN pk ON d.event_type = pk.event_type
      JOIN pkday ON d.event_type = pkday.event_type
      GROUP BY d.event_type, pk.peak_abs, pkday.peak_day
      ORDER BY d.event_type"""))

  val all: Seq[QueryDef] =
    Seq(q192KsDrift, q193WoeBinning, q194SeasonalScreen)
}
