package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det

/** Round-5 surface, fourth tranche: Pareto skyline and distribution-shift
  * diagnostics.
  */
object Round5Queries4 {

  /** Per-segment Pareto SKYLINE — the multi-criteria "best customers"
    * operator: a customer is on the frontier unless some other customer in
    * the segment strictly dominates them (spent more AND ordered earlier).
    * The naive formulation is the quadratic NOT EXISTS self-join; the
    * distributed shape here is the 2-D skyline classic: sort each segment
    * by spend, then one window pass computes the suffix-minimum first-order
    * date over STRICTLY higher spenders (RANGE 1 FOLLOWING .. UNBOUNDED —
    * cents-integer spend makes "strictly greater" expressible as an
    * integer range bound, and excludes spend ties from dominating each
    * other), and a row survives iff that minimum is absent or not earlier.
    * O(n log n) per segment, one exchange, no pair materialization — at
    * 100 TB the window is partitioned by the grouping key exactly like
    * every other window in the surface.
    */
  val q142Skyline: QueryDef = QueryDef(
    "q142_skyline",
    (s, dir) => {
      val cust = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey").as("custkey"))
        // exact decimal accumulation (Det protocol): a double sum would be
        // partition-order-dependent before the floor
        .agg((sum(col("o_totalprice").cast("decimal(30,8)")) * 100)
          .cast("long").as("spend_c"),
          min(datediff(col("o_orderdate").cast("date"), lit("1992-01-01")))
            .as("first_day"))
      val w = Window.partitionBy("segment").orderBy(col("spend_c"))
        .rangeBetween(1L, Window.unboundedFollowing)
      cust
        .withColumn("dom_day", min(col("first_day")).over(w))
        .filter(col("dom_day").isNull || col("dom_day") >= col("first_day"))
        .select(col("segment"), col("custkey"),
          (col("spend_c").cast("double") / 100.0d).as("spend"),
          col("first_day"))
        .orderBy("segment", "custkey")
    },
    Some("""
      WITH cust AS (SELECT c_mktsegment AS segment, c_custkey AS custkey,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) * 100
                             AS BIGINT) AS spend_c,
                           CAST(min(date_diff('day', DATE '1992-01-01',
                             CAST(o_orderdate AS DATE))) AS INTEGER) AS first_day
                    FROM orders JOIN customer ON o_custkey = c_custkey
                    GROUP BY 1, 2),
      sky AS (SELECT *, min(first_day) OVER
                (PARTITION BY segment ORDER BY spend_c
                 RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS dom_day
              FROM cust)
      SELECT segment, custkey, CAST(spend_c AS DOUBLE) / 100.0e0 AS spend,
             first_day
      FROM sky WHERE dom_day IS NULL OR dom_day >= first_day
      ORDER BY segment, custkey"""))

  /** KL divergence per source vs the corpus unigram distribution — the
    * domain-shift diagnostic a data-mixture pipeline watches: D(p_src ‖
    * p_corpus) = Σ_w p(w) log2(p(w)/q(w)), computed from two hash
    * aggregates (per-source and global word counts — the only
    * corpus-sized work) and folded per source in word-sorted order (the
    * q114/q140 order-pinned protocol) so both engines execute the
    * identical IEEE sequence. Every p, q is an exact-integer ratio;
    * support is identical by construction (p absolutely continuous
    * w.r.t. q), so no smoothing term is needed. High KL = the source's
    * vocabulary diverges from the mixture — the signal that drives
    * reweighting (q104).
    */
  val q143KlDivergence: QueryDef = QueryDef(
    "q143_kl_divergence",
    (s, dir) => {
      val tok = Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .transform(graft.operators.ScopedCache.cache) // feeds the corpus aggregate and the per-source folds
      val corpus = tok.groupBy("w").agg(sum(col("c")).as("cw"))
      val totals = corpus.agg(sum(col("cw")).as("t"))
      tok.join(broadcast(corpus), "w")
        .crossJoin(broadcast(totals))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"),
          array_sort(collect_list(struct(col("w"), col("c"), col("cw"), col("t"))))
            .as("terms"))
        .select(col("source"), col("n_tokens"),
          Det.rdet(
            aggregate(col("terms"), lit(0.0d), (acc, x) =>
              acc + (x("c").cast("double") / col("n_tokens")) *
                log2((x("c").cast("double") / col("n_tokens")) /
                  (x("cw").cast("double") / x("t")))), 6).as("kl_bits"))
        .orderBy("source")
    },
    Some("""
      WITH tok AS (SELECT source, word AS w, CAST(count(*) AS BIGINT) AS c
                   FROM (SELECT source, unnest(string_split(text, ' ')) AS word
                         FROM documents)
                   WHERE word != '' GROUP BY 1, 2),
      corpus AS (SELECT w, SUM(c) AS cw FROM tok GROUP BY 1),
      tot AS (SELECT SUM(cw) AS t FROM corpus),
      terms AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                       list([CAST(c AS VARCHAR), CAST(corpus.cw AS VARCHAR),
                             CAST(tot.t AS VARCHAR)] ORDER BY w) AS ts
                FROM tok JOIN corpus USING (w) CROSS JOIN tot
                GROUP BY source)
      SELECT source, n_tokens,
             floor(list_reduce(
                     list_prepend(CAST(0 AS DOUBLE),
                       list_transform(ts, x ->
                         (CAST(x[1] AS DOUBLE) / n_tokens) *
                           log2((CAST(x[1] AS DOUBLE) / n_tokens) /
                             (CAST(x[2] AS DOUBLE) / CAST(x[3] AS DOUBLE))))),
                     (acc, v) -> acc + v) * 1e6 + 0.5) / 1e6 AS kl_bits
      FROM terms ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(q142Skyline, q143KlDivergence)
}
