package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Det

/** Round-6 surface, third tranche: statistical profiling at corpus scale —
  * a one-pass Pearson correlation matrix over exact integer moments, a
  * chi-squared independence test on a label×source contingency, and per-key
  * exponentially-weighted moving averages via an ordered array fold.
  */
object Round6Queries3 {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Truncating division by 2^32 — drops 32 low bits so the centered
    * second-moment terms (n·Σx² − (Σx)², up to ~n²·x² ≈ 10^25 at sf0.1 and
    * ~10^38 at cluster scale) fit exactly in both int64 and an IEEE double
    * (< 2^53). Spark's `%` and DuckDB's `//` both truncate toward zero, so
    * the same expression is exact in either engine for either sign — the
    * choice of divisor affects ACCURACY (relative error ≤ 2^32/|x|, about
    * 1e-9 at the smallest covariances here — far below the rdet6 output
    * rounding) but never determinism, while sidestepping the DECIMAL→DOUBLE
    * cast that is NOT engine-portable above 2^53 (see [[Det.dsum]]).
    */
  private def shrink(a: Column): Column =
    ((a - a % 4294967296L) / 4294967296L).cast("long")
  private def shrinkSql(a: String): String = s"(($a) // 4294967296)"

  /** PEARSON CORRELATION MATRIX over lineitem's four numeric measures —
    * the profiling pass any feature pipeline runs before modeling, as ONE
    * scan: every value is exact-integer-scaled at the leaves (quantity
    * units, price/discount/tax cents), all 14 moments (4 sums, 4 sums of
    * squares, 6 cross-products) accumulate in a single DECIMAL(38,0)
    * hash-free scalar aggregate, and the 6 output rows are arithmetic over
    * that one-row result. r = (n·Σxy − ΣxΣy)/√(vx·vy) with the three big
    * integers [[shrink]]-scaled identically in both engines before the only
    * double step (one sqrt + one divide), then ×10⁶ rounding. At 100 TB
    * this is one pass, mergeable partial state, zero shuffles beyond the
    * scalar-aggregate reduce — correlation never needs a pairwise join.
    */
  val q177CorrMatrix: QueryDef = QueryDef(
    "q177_corr_matrix",
    (s, dir) => {
      val cents = (c: Column) => floor(c * 100 + 0.5).cast("long")
      val base = Tables.load(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_discount")).as("disc_c"),
        cents(col("l_tax")).as("tax_c"))
      val vars = Seq("qty", "price_c", "disc_c", "tax_c")
      val pairs = for { i <- vars.indices; j <- i + 1 until vars.size }
        yield (vars(i), vars(j))
      val moments =
        vars.map(v => sum(dec(col(v))).as(s"s_$v")) ++
          vars.map(v => sum(dec(col(v)) * dec(col(v))).as(s"ss_$v")) ++
          pairs.map { case (x, y) => sum(dec(col(x)) * dec(col(y))).as(s"sp_${x}_$y") }
      val g = base.agg(count(lit(1)).as("n"), moments: _*)
      def rRow(x: String, y: String) = {
        val num = dec(col("n")) * col(s"sp_${x}_$y") - col(s"s_$x") * col(s"s_$y")
        val vx = dec(col("n")) * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x")
        val vy = dec(col("n")) * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y")
        g.select(lit(x).as("var_x"), lit(y).as("var_y"), col("n"),
          when(shrink(vx) === 0 || shrink(vy) === 0, 0L)
            .otherwise(Det.rdetLong(shrink(num).cast("double")
              / sqrt(shrink(vx).cast("double") * shrink(vy).cast("double")), 6))
            .as("r_e6"))
      }
      pairs.map { case (x, y) => rRow(x, y) }.reduce(_ unionByName _)
        .orderBy("var_x", "var_y")
    },
    Some {
      val vars = Seq("qty", "price_c", "disc_c", "tax_c")
      val pairs = for { i <- vars.indices; j <- i + 1 until vars.size }
        yield (vars(i), vars(j))
      def rSql(x: String, y: String): String = {
        val num = s"(n*sp_${x}_$y - s_$x*s_$y)"
        val vx = s"(n*ss_$x - s_$x*s_$x)"
        val vy = s"(n*ss_$y - s_$y*s_$y)"
        s"""SELECT '$x' AS var_x, '$y' AS var_y, n,
           | CASE WHEN ${shrinkSql(vx)} = 0 OR ${shrinkSql(vy)} = 0 THEN CAST(0 AS BIGINT)
           |      ELSE ${Det.rdetLongSql(
                 s"""CAST(${shrinkSql(num)} AS DOUBLE)
                    | / sqrt(CAST(${shrinkSql(vx)} AS DOUBLE)
                    |        * CAST(${shrinkSql(vy)} AS DOUBLE))""".stripMargin
                   .replace("\n", " "), 6)}
           | END AS r_e6
           |FROM g""".stripMargin.replace("\n", " ")
      }
      s"""
      WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
                        CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS price_c,
                        CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS disc_c,
                        CAST(floor(l_tax*100 + 0.5) AS BIGINT) AS tax_c
                 FROM lineitem),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             ${vars.map(v => s"SUM($v) AS s_$v").mkString(", ")},
             ${vars.map(v => s"SUM($v*$v) AS ss_$v").mkString(", ")},
             ${pairs.map { case (x, y) => s"SUM($x*$y) AS sp_${x}_$y" }.mkString(", ")}
            FROM b)
      ${pairs.map { case (x, y) => rSql(x, y) }.mkString("\n      UNION ALL\n      ")}
      ORDER BY var_x, var_y"""
    })

  /** CHI-SQUARED INDEPENDENCE between the document label (`lang`) and its
    * provenance (`source`) — the "is my labeling correlated with where the
    * data came from" bias check run before training. Computed on the FULL
    * margin cross (zero-observed cells included — they still carry expected
    * mass): per cell χ² contribution (o−e)²/e expands to the integer ratio
    * (o·N − nt·np)²/(N·nt·np), rounded per cell by [[Det.ihalfUp]] and
    * summed as exact longs — no doubles anywhere, so cross-engine summation
    * order is irrelevant. Scale: one (lang, source) hash aggregate, two
    * margin re-aggregations of it, and a classes×sources broadcast cross —
    * the data is touched once; everything after is contingency-table-sized.
    */
  val q178Chi2Independence: QueryDef = QueryDef(
    "q178_chi2_independence",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val obs = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val nt = obs.groupBy("lang").agg(sum("o").as("nt"))
      val np = obs.groupBy("source").agg(sum("o").as("np"))
      val tot = obs.agg(sum("o").as("bign"))
      val cells = nt.crossJoin(broadcast(np)).crossJoin(broadcast(tot))
        .join(obs, Seq("lang", "source"), "left_outer")
        .na.fill(0L, Seq("o"))
      val num = dec(col("o")) * dec(col("bign")) - dec(col("nt")) * dec(col("np"))
      val contrib = Det.ihalfUp(num * num * 1000000L,
        dec(col("bign")) * dec(col("nt")) * dec(col("np")))
      cells.agg(
          max(col("bign")).as("n"),
          countDistinct(col("lang")).as("r_classes"),
          countDistinct(col("source")).as("c_classes"),
          sum(contrib).as("chi2_e6"))
        .select(col("n"), col("r_classes"), col("c_classes"),
          ((col("r_classes") - 1) * (col("c_classes") - 1)).as("dof"),
          col("chi2_e6"))
    },
    Some(s"""
      WITH obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                   FROM documents GROUP BY 1, 2),
      nt AS (SELECT lang, SUM(o) AS nt FROM obs GROUP BY 1),
      np AS (SELECT source, SUM(o) AS np FROM obs GROUP BY 1),
      tot AS (SELECT SUM(o) AS bign FROM obs),
      cells AS (SELECT nt.lang, np.source, nt.nt, np.np, tot.bign,
                       COALESCE(obs.o, 0) AS o
                FROM nt CROSS JOIN np CROSS JOIN tot
                LEFT JOIN obs ON obs.lang = nt.lang AND obs.source = np.source)
      SELECT CAST(max(bign) AS BIGINT) AS n,
             CAST(count(DISTINCT lang) AS BIGINT) AS r_classes,
             CAST(count(DISTINCT source) AS BIGINT) AS c_classes,
             CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
               AS BIGINT) AS dof,
             CAST(SUM(${Det.ihalfUpSql(
               "(o*bign - nt*np)*(o*bign - nt*np)*1000000", "bign*nt*np")})
               AS BIGINT) AS chi2_e6
      FROM cells"""))

  /** Per-user EWMA of event values (α = 0.25) — the smoothed per-entity
    * signal behind rate limiting, anomaly baselines, and engagement scores.
    * EWMA is inherently sequential per key, so the distributed shape is:
    * one hash aggregate collecting each user's (ts, event_id, value) events
    * into an array, an in-memory sort of that array (order fixed by the
    * (ts, event_id) total order), and ONE codegen'd fold
    * (`functions.aggregate`) seeded with the first value — mirroring
    * DuckDB's list_reduce seeding exactly. State is bounded by per-user
    * event count (the same bound any sessionizer holds); users are
    * independent, so 100 TB parallelizes on the user hash with no global
    * sort and no window. The fold's double sequence is identical in both
    * engines (same seed, same order, same IEEE ops), then ×10⁶ rounding.
    */
  val q179Ewma: QueryDef = QueryDef(
    "q179_ewma",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      ev.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("value")))).as("arr"))
        .withColumn("vals", transform(col("arr"), x => x.getField("value")))
        .select(col("user_id"),
          size(col("vals")).cast("long").as("n_events"),
          Det.rdetLong(aggregate(
            slice(col("vals"), lit(2), size(col("vals")) - 1),
            element_at(col("vals"), 1),
            (acc, x) => acc * lit(0.75d) + x * lit(0.25d)), 6).as("ewma_e6"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH l AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                 FROM events GROUP BY 1)
      SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
             ${Det.rdetLongSql(
               "list_reduce(vals, (a, x) -> a*0.75e0 + x*0.25e0)", 6)} AS ewma_e6
      FROM l ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(q177CorrMatrix, q178Chi2Independence, q179Ewma)
}
