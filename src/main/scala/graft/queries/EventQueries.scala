package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det
import graft.functions.Det.{dsum, dsumSql}

/** Event-stream analytics in batch form: tumbling-window aggregation (the
  * batch-equivalent of graft.streaming.EventsStreaming — same bucketing
  * logic, oracle-checkable) and gap-based sessionization. Time buckets are
  * pure integer microsecond arithmetic so both engines agree exactly.
  */
object EventQueries {

  /** 5-minute tumbling buckets: (bucket_us, event_type) → count, sum. */
  val q37TumblingWindow: QueryDef = QueryDef(
    "q37_tumbling_window",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(expr("(unix_micros(ts) DIV 300000000) * 300000000").as("bucket_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket_us", "event_type"),
    Some(s"""
      SELECT (epoch_us(ts) // 300000000) * 300000000 AS bucket_us,
             event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Gap sessionization: a >30-minute silence starts a new session.
    * lag + flag + per-user aggregation — the classic streaming-state shape
    * expressed as windows.
    */
  val q38Sessionize: QueryDef = QueryDef(
    "q38_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg((sum(col("brk")) + 1L).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      m AS (SELECT user_id,
              CASE WHEN us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM e)
      SELECT user_id, CAST(sum(brk) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
      FROM m GROUP BY user_id ORDER BY user_id"""))

  /** Ordered conversion funnel view → click → purchase: each user's first
    * view, first click at-or-after it, first purchase at-or-after that —
    * three stages of conditional mins, each depending on the previous
    * stage's timestamp. Per-user work is two broadcast-joined conditional
    * aggregations (no window over the full stream), then one global rollup.
    */
  val q80Funnel: QueryDef = QueryDef(
    "q80_funnel",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      val c = e.join(broadcast(v), "user_id")
        .filter(col("event_type") === "click" && col("us") >= col("v_us"))
        .groupBy("user_id").agg(min("us").as("c_us"))
      val p = e.join(broadcast(c), "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("c_us"))
        .groupBy("user_id").agg(min("us").as("p_us"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_view"),
          count(col("c_us")).as("n_view_click"),
          count(col("p_us")).as("n_full_funnel"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND us >= v_us GROUP BY 1),
      p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND us >= c_us GROUP BY 1)
      SELECT count(*) AS n_view, count(c_us) AS n_view_click,
             count(p_us) AS n_full_funnel
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""))

  /** Weekly cohort retention: users belong to their first-seen week; each
    * (cohort, week offset) cell counts the cohort members active that week.
    * Two aggregations and one broadcast join — the standard retention
    * triangle at any event volume.
    */
  val q89CohortRetention: QueryDef = QueryDef(
    "q89_cohort_retention",
    (s, dir) => {
      val weekUs = 604800000000L
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) DIV $weekUs").as("wk"))
      val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      e.distinct()
        .join(broadcast(cohort), "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_wk", "wk_offset")
    },
    Some("""
      WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
      SELECT cohort_wk, wk - cohort_wk AS wk_offset,
             count(DISTINCT user_id) AS n_active
      FROM e JOIN cohort USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Gini concentration of per-user spend, computed exactly: rank the
    * per-user totals (decimal-exact), then
    * G = (2·Σ i·x_i)/(n·Σ x_i) − (n+1)/n over the sorted series. Every sum
    * is an exact scaled long, so the coefficient is bit-identical across
    * engines and partitionings. The global rank is the distributed two-phase
    * form (graft.operators.Ranks) — no single-partition window anywhere in
    * the plan, so the ranking scales with the user count.
    */
  val q90Gini: QueryDef = QueryDef(
    "q90_gini",
    (s, dir) => {
      val spend = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(dsum(col("value")).as("x"))
      val ranked = graft.operators.Ranks
        .globalRowNumber(spend, Seq(col("x"), col("user_id")), "i")
        .withColumn("cx", floor(col("x") * 100 + 0.5).cast("long"))
      ranked.agg(count(lit(1)).as("n"), sum(col("cx")).as("sx"),
          sum(col("i") * col("cx")).as("six"))
        .select(Det.rdet(
          lit(2.0d) * col("six") / (col("n") * col("sx").cast("double")) -
            (col("n") + 1L).cast("double") / col("n"), 6).as("gini"),
          col("n"))
    },
    Some(s"""
      WITH spend AS (SELECT user_id, ${dsumSql("value")} AS x FROM events GROUP BY 1),
      ranked AS (SELECT x, CAST(floor(x * 100 + 0.5e0) AS BIGINT) AS cx,
                        CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
                 FROM spend)
      SELECT ${Det.rdetSql(
        "2.0e0 * sum(i * cx) / (count(*) * CAST(sum(cx) AS DOUBLE)) - (count(*) + 1) / CAST(count(*) AS DOUBLE)", 6)}
               AS gini,
             count(*) AS n
      FROM ranked"""))

  /** Gap-filled daily resample with forward fill: each user's sparse daily
    * totals are densified onto the full day grid between their first and
    * last activity, missing days carry the last observed value forward
    * (last(_, ignoreNulls) over the interleaved grid — the same carry the
    * as-of join uses), and n_days pins the grid length. Time-series
    * resampling as pure windows — no driver loop, one shuffle per user key.
    */
  val q91GapFill: QueryDef = QueryDef(
    "q91_gap_fill",
    (s, dir) => {
      val dayUs = 86400000000L
      val daily = Tables.load(s, dir, "events")
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"), expr(s"unix_micros(ts) DIV $dayUs").as("day"))
        .agg(dsum(col("value")).as("v"))
      val grid = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
        .withColumn("was_gap", col("v").isNull)
        .select("user_id", "day", "filled", "was_gap")
        .orderBy("user_id", "day")
    },
    Some(s"""
      WITH daily AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                            ${dsumSql("value")} AS v
                     FROM events WHERE user_id < 10 GROUP BY 1, 2),
      grid AS (SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
               FROM daily GROUP BY user_id)
      SELECT user_id, day,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
             v IS NULL AS was_gap
      FROM grid LEFT JOIN daily USING (user_id, day)
      ORDER BY user_id, day"""))

  /** Sequence-pattern detection (CEP-lite, the MATCH_RECOGNIZE shape that
    * fits windows): an 'error' followed by a 'purchase' within the user's
    * next 3 events. Pattern tests are lead() comparisons inside one window
    * pass — no self-join, no state machine, total event order per user.
    */
  val q97SequencePattern: QueryDef = QueryDef(
    "q97_sequence_pattern",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val hit = (1 to 3).map(i => lead(col("event_type"), i).over(w) === "purchase")
        .reduce(_ || _)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("is_hit", col("event_type") === "error" && coalesce(hit, lit(false)))
        .groupBy("user_id")
        .agg(sum(when(col("is_hit"), 1L).otherwise(0L)).as("n_patterns"),
          min(when(col("is_hit"), col("event_id"))).as("first_hit_event"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      m AS (SELECT user_id, event_id,
              (event_type = 'error' AND coalesce(
                 lead(event_type, 1) OVER w = 'purchase'
                 OR lead(event_type, 2) OVER w = 'purchase'
                 OR lead(event_type, 3) OVER w = 'purchase', false)) AS is_hit
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      SELECT user_id,
             CAST(sum(CASE WHEN is_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_patterns,
             min(CASE WHEN is_hit THEN event_id END) AS first_hit_event
      FROM m GROUP BY user_id ORDER BY user_id"""))

  /** Per-user time-weighted average of `value` under step interpolation:
    * each event's value holds until the user's next event; the last event
    * carries no weight. Second-resolution integer arithmetic end to end —
    * v4 = value·1e4 as long, dt in whole seconds — so the weighted sum is
    * exact (≤ 2^53) and order-independent; only the final division touches
    * floating point, then rounds deterministically.
    */
  val q106TimeWeightedAvg: QueryDef = QueryDef(
    "q106_time_weighted_avg",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("unix_micros(ts) div 1000000").as("sec"),
          floor(col("value") * 1e4 + 0.5).cast("long").as("v4"))
        .withColumn("next_sec", lead("sec", 1).over(w))
        .filter(col("next_sec").isNotNull)
        .withColumn("dt", col("next_sec") - col("sec"))
        .groupBy("user_id")
        .agg(sum(col("v4") * col("dt")).as("psum"), sum("dt").as("dtsum"),
          count(lit(1)).as("n_holds"))
        .filter(col("dtsum") > 0)
        .select(col("user_id"), col("n_holds"),
          Det.rdet(col("psum").cast("double") / col("dtsum") / 1e4, 6).as("twa"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, ts,
                   epoch_us(ts) // 1000000 AS sec,
                   CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS v4
                 FROM events),
      h AS (SELECT user_id, v4, sec,
              lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS next_sec
            FROM e),
      d AS (SELECT user_id, v4, next_sec - sec AS dt
            FROM h WHERE next_sec IS NOT NULL)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_holds,
             floor((CAST(SUM(v4 * dt) AS DOUBLE) / SUM(dt) / 1e4) * 1e6 + 0.5)
               / 1e6 AS twa
      FROM d GROUP BY user_id HAVING SUM(dt) > 0 ORDER BY user_id"""))

  /** First-order behavior model: the event-type transition matrix over each
    * user's time-ordered stream — one window pass for the successor, one
    * hash aggregation for the counts, total broadcast back for shares.
    */
  val q107EventTransitions: QueryDef = QueryDef(
    "q107_event_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tr = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.agg(sum("n").as("total"))
      tr.crossJoin(broadcast(tot))
        .select(col("from_type"), col("to_type"), col("n"),
          Det.rdet(col("n").cast("double") / col("total"), 6).as("share"))
        .orderBy("from_type", "to_type")
    },
    Some("""
      WITH t AS (SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_type
                 FROM events),
      tr AS (SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
             FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tr)
      SELECT from_type, to_type, n,
             floor((CAST(n AS DOUBLE) / total) * 1e6 + 0.5) / 1e6 AS share
      FROM tr CROSS JOIN tot ORDER BY from_type, to_type"""))

  /** 10-minute windows sliding every 5 minutes: each event lands in exactly
    * two windows (window start = the two 5-min slots at or before ts).
    * Batch twin of Structured Streaming's window(ts, "10 min", "5 min") as
    * pure integer bucket arithmetic — the slide explodes each event into
    * its window starts, then one hash aggregation; both engines agree
    * exactly.
    */
  val q109SlidingWindow: QueryDef = QueryDef(
    "q109_sliding_window",
    (s, dir) => {
      val slideUs = 300000000L // 5 min
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"),
          expr(s"(unix_micros(ts) div $slideUs) * $slideUs").as("slot_us"))
        .select(col("event_type"), col("value"),
          explode(array(col("slot_us") - slideUs, col("slot_us"))).as("win_start_us"))
        .groupBy("win_start_us", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("win_start_us", "event_type")
    },
    Some(s"""
      WITH slotted AS (SELECT event_type, value,
                         (epoch_us(ts) // 300000000) * 300000000 AS slot_us
                       FROM events),
      exploded AS (SELECT event_type, value,
                     unnest([slot_us - 300000000, slot_us]) AS win_start_us
                   FROM slotted)
      SELECT win_start_us, event_type, count(*) AS n,
             ${dsumSql("value")} AS sum_value
      FROM exploded GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q37TumblingWindow, q38Sessionize, q80Funnel,
    q89CohortRetention, q90Gini, q91GapFill, q97SequencePattern,
    q106TimeWeightedAvg, q107EventTransitions, q109SlidingWindow)
}
