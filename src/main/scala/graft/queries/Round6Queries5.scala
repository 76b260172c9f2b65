package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{Det, HashFunctions}

/** Round-6 surface, fifth tranche: time-series diagnostics over aggregated
  * daily series (autocorrelation, CUSUM changepoint) and fuzzy record
  * linkage (dirty strings → canonical catalog via multi-pass blocking).
  *
  * The time-series queries share one scale posture: the raw fact table is
  * touched by exactly ONE hash aggregate (to the per-day grain); everything
  * after runs on the day-bounded series relation (thousands of rows at any
  * corpus size), so windows and self-joins there cost nothing at 100 TB.
  */
object Round6Queries5 {
  private val D38 = DecimalType(38, 0)

  /** AUTOCORRELATION of the daily order-count series at lags 1–7 — the
    * seasonality probe run before fitting any forecasting model. The series
    * x_t comes from one corpus-sized aggregate; pairs (x_t, x_{t+k}) come
    * from a per-lag equi-join of the tiny series with itself on the shifted
    * day (7 lags × ~2400 days — never the fact table). The ACF estimator
    * uses the full-series mean in both factors; multiplying through by n²
    * makes numerator and denominator EXACT integers:
    *   n²·num_k = n²·Σab − n·S·(Σa + Σb) + n_k·S²
    *   n²·den   = n²·Q − n·S²          (S = Σx, Q = Σx²)
    * accumulated in DECIMAL(38,0) (HUGEINT in the oracle) so the only
    * rounding anywhere is the final half-up ÷ to parts-per-million.
    */
  val q182Autocorr: QueryDef = QueryDef(
    "q182_autocorr",
    (s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
      val lags = s.range(1, 8).toDF("lag")
      val pairs = daily.as("a").crossJoin(broadcast(lags))
        .withColumn("day2", date_add(col("day"), col("lag").cast("int")))
        .join(daily.as("b"), col("b.day") === col("day2"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.x") * col("b.x")).as("sab"),
          sum(col("a.x")).as("sa"), sum(col("b.x")).as("sb"))
      val d = (c: String) => col(c).cast(D38)
      pairs.crossJoin(broadcast(tot))
        .withColumn("num",
          d("n") * d("n") * d("sab") - d("n") * d("s") * (d("sa") + d("sb")) +
            d("n_pairs") * d("s") * d("s"))
        .withColumn("den", d("n") * d("n") * d("q") - d("n") * d("s") * d("s"))
        .select(col("lag"), col("n_pairs"),
          Det.ihalfUpSigned(col("num") * lit(1000000).cast(D38), col("den"))
            .as("acf_ppm"))
        .orderBy("lag")
    },
    Some(s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS x
                     FROM orders GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
                     CAST(sum(x*x) AS HUGEINT) AS q
              FROM daily),
      pr AS (SELECT l.lag, CAST(count(*) AS HUGEINT) AS n_pairs,
                    CAST(sum(a.x * b.x) AS HUGEINT) AS sab,
                    CAST(sum(a.x) AS HUGEINT) AS sa, CAST(sum(b.x) AS HUGEINT) AS sb
             FROM daily a
             CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
             JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
             GROUP BY 1),
      f AS (SELECT lag, n_pairs,
                   n*n*sab - n*s*(sa + sb) + n_pairs*s*s AS num,
                   n*n*q - n*s*s AS den
            FROM pr CROSS JOIN tot)
      SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
             ${Det.ihalfUpSignedSql("num * 1000000", "den")} AS acf_ppm
      FROM f ORDER BY lag"""))

  /** CUSUM changepoint detection per event type — "did this stream's daily
    * volume drift from its mean, and when". The one-sided CUSUM
    * S_t = max(0, S_{t-1} + (x_t − μ)) is NOT computed as a sequential fold:
    * the identity S_t = P_t − min(0, min_{j≤t} P_j) (P = running prefix sum
    * of deviations) turns it into two ordinary cumulative windows, both
    * PARTITIONED by event type — fully relational, no per-key state, no
    * driver loop. Deviations are scaled by n (d_t = n·x_t − S) so the mean
    * never becomes a fraction; everything until the final ÷ is exact int64.
    * Output per type: the peak CUSUM (in hundredths of events, half-up), the
    * first day it peaks, and how many days ran above a 2-day-mean threshold.
    */
  val q183Cusum: QueryDef = QueryDef(
    "q183_cusum",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val wAll = Window.partitionBy("event_type")
      val wOrd = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cus = daily
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum("x").over(wAll))
        .withColumn("p", sum(col("n") * col("x") - col("s")).over(wOrd))
        .withColumn("m", least(lit(0L), min(col("p")).over(wOrd)))
        .withColumn("cus", col("p") - col("m"))
      val mx = cus.groupBy("event_type")
        .agg(max("n").as("n_days"), max("cus").as("mx"),
          sum(when(col("cus") > lit(2L) * col("s"), 1L).otherwise(0L))
            .as("days_over_2mean"))
      cus.join(mx.select(col("event_type"), col("mx")), Seq("event_type"))
        .filter(col("cus") === col("mx"))
        .groupBy("event_type").agg(min("day").as("peak_day"))
        .join(mx, Seq("event_type"))
        .select(col("event_type"), col("n_days"),
          Det.ihalfUpSigned(col("mx") * 100, col("n_days")).as("peak_cusum_x100"),
          col("peak_day"), col("days_over_2mean"))
        .orderBy("event_type")
    },
    Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
      c AS (SELECT event_type, day, x,
                   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                   CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS s
            FROM daily),
      p AS (SELECT *,
                   CAST(sum(n*x - s) OVER (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
            FROM c),
      q AS (SELECT *,
                   pfx - least(0, min(pfx) OVER (PARTITION BY event_type
                     ORDER BY day ROWS UNBOUNDED PRECEDING)) AS cus
            FROM p),
      mx AS (SELECT event_type, max(n) AS n_days, max(cus) AS mx,
                    CAST(sum(CASE WHEN cus > 2*s THEN 1 ELSE 0 END) AS BIGINT)
                      AS days_over_2mean
             FROM q GROUP BY 1),
      pk AS (SELECT q.event_type, min(day) AS peak_day
             FROM q JOIN mx ON q.event_type = mx.event_type AND q.cus = mx.mx
             GROUP BY 1)
      SELECT mx.event_type AS event_type, n_days,
             CAST((2*(CASE WHEN mx >= 0 THEN mx ELSE -mx END)*100 + n_days)
                  // (2*n_days) AS BIGINT)
               * (CASE WHEN mx >= 0 THEN 1 ELSE -1 END) AS peak_cusum_x100,
             peak_day, days_over_2mean
      FROM mx JOIN pk ON mx.event_type = pk.event_type
      ORDER BY event_type"""))

  /** FUZZY RECORD LINKAGE — dirty listings canonicalized against a catalog,
    * the entity-resolution shape every merged corpus needs. Each part's
    * "listing title" is its name with one deterministic character deletion
    * (position = hash32(name#key) mod len). Candidates come from TWO
    * blocking passes, both plain equi-joins on (first char, length):
    * pass A keys the title's first char (catches deletions at position ≥1);
    * pass B keys the NAME's second char (catches position-0 deletions,
    * where the first char itself disappeared). A single-char deletion
    * always lands in one of the two blocks, so the TRUE source name is a
    * candidate for every listing — recall 1 by construction, with candidate
    * work ∝ Σ block² over (char, length) blocks, never listings × catalog.
    * Levenshtein ≤ 1 verifies; ties resolve to the (distance, name)-least
    * match via a per-listing row_number (listing-sized partitions).
    */
  val q184FuzzyLink: QueryDef = QueryDef(
    "q184_fuzzy_link",
    (s, dir) => {
      val parts = Tables.load(s, dir, "part")
        .withColumn("pos", pmod(HashFunctions.hash32(
            concat(col("p_name"), lit("#"), col("p_partkey").cast("string"))),
          length(col("p_name"))).cast("int"))
        .select(col("p_partkey"),
          expr("substr(p_name, 1, pos) || substr(p_name, pos + 2, 1000)")
            .as("title"))
      val catalog = Tables.load(s, dir, "part").select(col("p_name")).distinct()
      val blocks = catalog
        .select(col("p_name"), substring(col("p_name"), 1, 1).as("bc"),
          (length(col("p_name")) - 1).as("bl"))
        .unionByName(catalog.select(col("p_name"),
          substring(col("p_name"), 2, 1).as("bc"),
          (length(col("p_name")) - 1).as("bl")))
        .distinct()
      val cand = parts
        .join(broadcast(blocks),
          substring(col("title"), 1, 1) === col("bc") &&
            length(col("title")) === col("bl"))
        .filter(levenshtein(col("title"), col("p_name")) <= 1)
        .withColumn("lev", levenshtein(col("title"), col("p_name")))
      val w = Window.partitionBy("p_partkey").orderBy(col("lev"), col("p_name"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("p_partkey"), col("title"),
          col("p_name").as("match_name"), col("lev").cast("long").as("lev"))
        .orderBy("p_partkey")
    },
    Some("""
      WITH src AS (SELECT p_partkey, p_name,
                     CAST(('0x' || substr(md5(p_name || '#' ||
                       CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT
                       % length(p_name) AS INTEGER) AS pos
                   FROM part),
      listings AS (SELECT p_partkey,
                     substr(p_name, 1, pos) || substr(p_name, pos + 2, 1000)
                       AS title
                   FROM src),
      catalog AS (SELECT DISTINCT p_name FROM part),
      blocks AS (SELECT DISTINCT p_name, bc, bl FROM (
                   SELECT p_name, substr(p_name, 1, 1) AS bc,
                          length(p_name) - 1 AS bl FROM catalog
                   UNION ALL
                   SELECT p_name, substr(p_name, 2, 1) AS bc,
                          length(p_name) - 1 AS bl FROM catalog)),
      cand AS (SELECT l.p_partkey, l.title, b.p_name,
                      levenshtein(l.title, b.p_name) AS lev
               FROM listings l
               JOIN blocks b ON substr(l.title, 1, 1) = b.bc
                            AND length(l.title) = b.bl
               WHERE levenshtein(l.title, b.p_name) <= 1),
      best AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
                                            ORDER BY lev, p_name) AS rn
               FROM cand)
      SELECT p_partkey, title, p_name AS match_name, CAST(lev AS BIGINT) AS lev
      FROM best WHERE rn = 1 ORDER BY p_partkey"""))

  val all: Seq[QueryDef] = Seq(q182Autocorr, q183Cusum, q184FuzzyLink)
}
