package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Det
import graft.operators.Ranks

/** Round-6 surface, fourth tranche: information-theoretic dependence
  * (mutual information over the q178 contingency) and the observability
  * staple — exact per-day latency percentiles on the distributed-rank
  * operator with an integer nearest-rank convention shared verbatim with
  * the oracle.
  */
object Round6Queries4 {

  /** MUTUAL INFORMATION between document label and provenance — the
    * information-theoretic companion to q178's chi-squared (chi2 says
    * "dependent or not", MI says how many nats the source leaks about the
    * label), plus both marginal entropies and the normalized MI. Per-cell
    * and per-margin terms are ln() of exact integer ratios rounded to
    * ×10⁹ longs at the LEAF (libm-stable under the rdet protocol), so the
    * cross-cell summation is pure integer arithmetic — order-independent in
    * both engines; the only trailing doubles are the final ÷10³ rescales
    * and the NMI combination of already-identical integers. Scale: same as
    * q178 — one (lang, source) aggregate, margin re-aggregations, broadcast
    * joins of contingency-sized relations; data touched once.
    */
  val q180MutualInfo: QueryDef = QueryDef(
    "q180_mutual_info",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val obs = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val nt = obs.groupBy("lang").agg(sum("o").as("nt"))
      val np = obs.groupBy("source").agg(sum("o").as("np"))
      val tot = obs.agg(sum("o").as("bign"))
      val cells = obs.join(broadcast(nt), "lang").join(broadcast(np), "source")
        .crossJoin(broadcast(tot))
      val miCell = Det.rdetLong(
        (col("o").cast("double") / col("bign"))
          * log((col("o").cast("double") * col("bign"))
            / (col("nt").cast("double") * col("np"))), 9)
      val miSum = cells.agg(sum(miCell).as("mi_e9"))
      def hSum(m: org.apache.spark.sql.DataFrame, c: String, out: String) =
        m.crossJoin(broadcast(tot)).agg(sum(Det.rdetLong(
          -(col(c).cast("double") / col("bign"))
            * log(col(c).cast("double") / col("bign")), 9)).as(out))
      val h1 = hSum(nt, "nt", "hl_e9")
      val h2 = hSum(np, "np", "hs_e9")
      miSum.crossJoin(h1).crossJoin(h2).crossJoin(tot).select(
        col("bign").as("n"),
        Det.ihalfUp(col("hl_e9"), lit(1000L)).as("h_lang_e6"),
        Det.ihalfUp(col("hs_e9"), lit(1000L)).as("h_source_e6"),
        Det.ihalfUpSigned(col("mi_e9"), lit(1000L)).as("mi_e6"),
        when(col("hl_e9") === 0 || col("hs_e9") === 0, 0L)
          .otherwise(Det.rdetLong(col("mi_e9").cast("double")
            / sqrt(col("hl_e9").cast("double") * col("hs_e9").cast("double")), 6))
          .as("nmi_e6"))
    },
    Some(s"""
      WITH obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                   FROM documents GROUP BY 1, 2),
      nt AS (SELECT lang, SUM(o) AS nt FROM obs GROUP BY 1),
      np AS (SELECT source, SUM(o) AS np FROM obs GROUP BY 1),
      tot AS (SELECT SUM(o) AS bign FROM obs),
      mi AS (SELECT SUM(${Det.rdetLongSql(
        """(CAST(o AS DOUBLE) / bign)
           * ln((CAST(o AS DOUBLE) * bign) / (CAST(nt AS DOUBLE) * np))""", 9)})
               AS mi_e9
             FROM obs JOIN nt USING (lang) JOIN np USING (source), tot),
      h1 AS (SELECT SUM(${Det.rdetLongSql(
        "-(CAST(nt AS DOUBLE) / bign) * ln(CAST(nt AS DOUBLE) / bign)", 9)})
               AS hl_e9 FROM nt, tot),
      h2 AS (SELECT SUM(${Det.rdetLongSql(
        "-(CAST(np AS DOUBLE) / bign) * ln(CAST(np AS DOUBLE) / bign)", 9)})
               AS hs_e9 FROM np, tot)
      SELECT CAST(bign AS BIGINT) AS n,
             ${Det.ihalfUpSql("hl_e9", "1000")} AS h_lang_e6,
             ${Det.ihalfUpSql("hs_e9", "1000")} AS h_source_e6,
             ${Det.ihalfUpSignedSql("mi_e9", "1000")} AS mi_e6,
             CASE WHEN hl_e9 = 0 OR hs_e9 = 0 THEN CAST(0 AS BIGINT)
                  ELSE ${Det.rdetLongSql(
                    """CAST(mi_e9 AS DOUBLE)
                       / sqrt(CAST(hl_e9 AS DOUBLE) * CAST(hs_e9 AS DOUBLE))""", 6)}
             END AS nmi_e6
      FROM mi, h1, h2, tot"""))

  /** PER-DAY LATENCY PERCENTILES (p50/p95/p99, exact) — the SLO
    * dashboard query, over event values read as cents: per day, the exact
    * nearest-rank order statistics at k_p = ceil(p·n). Both engines share
    * the INTEGER rank convention ((p·n + 99) div 100 — never a double·n
    * product whose floor could land differently at representability
    * boundaries), and both select the k-th row under the identical
    * (value, event_id) total order. Spark side rides
    * [[Ranks.groupedRowNumber]] — the bucketed distributed rank built
    * exactly for few-giant-groups (a day of events at cluster scale is one
    * giant group; a naive Window.partitionBy(day) would funnel each day
    * through one task). One rank pass, one tiny per-day count join, one
    * conditional-aggregate pivot.
    */
  val q181LatencyPercentiles: QueryDef = QueryDef(
    "q181_latency_percentiles",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events").select(
        to_date(col("ts")).as("day"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
      val ranked = Ranks.groupedRowNumber(ev, Seq(col("day")),
        Seq(col("v_c"), col("event_id")), "rn")
      val counts = ev.groupBy("day").agg(count(lit(1)).as("n"))
      def k(p: Int) = ((col("n") * p + 99) - (col("n") * p + 99) % 100) / 100
      ranked.join(broadcast(counts), "day")
        .filter(col("rn") === k(50) || col("rn") === k(95) || col("rn") === k(99))
        .groupBy("day").agg(
          min(col("n")).as("n"),
          max(when(col("rn") === k(50), col("v_c"))).as("p50_c"),
          max(when(col("rn") === k(95), col("v_c"))).as("p95_c"),
          max(when(col("rn") === k(99), col("v_c"))).as("p99_c"))
        .orderBy("day")
    },
    Some("""
      WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_id,
                         CAST(floor(value*100 + 0.5) AS BIGINT) AS v_c
                  FROM events),
      r AS (SELECT day, v_c,
                   row_number() OVER (PARTITION BY day ORDER BY v_c, event_id)
                     AS rn,
                   count(*) OVER (PARTITION BY day) AS n
            FROM ev)
      SELECT day, CAST(min(n) AS BIGINT) AS n,
             max(CASE WHEN rn = (n*50 + 99) // 100 THEN v_c END) AS p50_c,
             max(CASE WHEN rn = (n*95 + 99) // 100 THEN v_c END) AS p95_c,
             max(CASE WHEN rn = (n*99 + 99) // 100 THEN v_c END) AS p99_c
      FROM r GROUP BY day ORDER BY day"""))

  val all: Seq[QueryDef] = Seq(q180MutualInfo, q181LatencyPercentiles)
}
