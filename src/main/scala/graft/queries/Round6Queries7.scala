package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{Det, HashFunctions}

/** Round-6 surface, seventh tranche: training-data SELECTION — the ops that
  * decide which documents a 100 TB corpus actually contributes to a training
  * mix (importance scoring, mixture rebalancing), plus the spectral
  * statistic (dominant covariance eigenvector) and the classic
  * exclusive-blame relational shape (TPC-H Q21's semi/anti structure,
  * rewritten as one pair-grain aggregate).
  */
object Round6Queries7 {
  private val D38 = DecimalType(38, 0)
  private def h32(x: String): String =
    s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  /** DSIR-STYLE IMPORTANCE SCORING — rank documents by how much more likely
    * their hashed-token profile is under a TARGET distribution (here: the
    * `en` slice) than under the RAW corpus distribution; the top of that
    * ranking is what data-selection pipelines feed the trainer first.
    * Features are tokens hashed into 256 buckets (hashed n-gram features,
    * the trick that keeps the LM distributions bounded at any vocabulary
    * size); both bucket LMs are add-one smoothed over the FULL 256-bucket
    * domain so unseen buckets score finitely. The per-bucket log-likelihood
    * ratio ln(p_tgt/p_raw) is computed once on the 256-row bucket relation
    * — as ln of a ratio of exact int64 products (each < 2^53, so the double
    * inputs are exact) — and quantized to a ×10⁹ long at the LEAF (rdet
    * protocol); each document's score is then a pure-integer Σ count·lr_e9,
    * order-independent in both engines. Scale: the corpus is scanned once
    * into the cached (doc, lang, bucket, count) relation; everything else is
    * 256-row broadcasts. Output: top 25 by (score desc, doc_id).
    */
  val q188ImportanceScore: QueryDef = QueryDef(
    "q188_importance_score",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(col("doc_id"), col("lang"),
          pmod(HashFunctions.hash32(col("w")), lit(256L)).as("b"))
      // the ONE corpus tokenization: lang rides the per-doc grain (it is
      // doc-functional, so the cardinality is unchanged) so the target LM,
      // the raw LM, the doc scores, AND the output lang all read this cache
      val perDoc = toks.groupBy("doc_id", "lang", "b")
        .agg(count(lit(1)).as("c")).transform(graft.operators.ScopedCache.cache)
      val tgt = perDoc.filter(col("lang") === "en")
        .groupBy("b").agg(sum("c").as("t"))
      val raw = perDoc.groupBy("b").agg(sum("c").as("r"))
      val tTot = tgt.agg(sum("t").as("tt"))
      val rTot = raw.agg(sum("r").as("rt"))
      val ratios = s.range(0, 256).toDF("b")
        .join(broadcast(tgt), Seq("b"), "left_outer")
        .join(broadcast(raw), Seq("b"), "left_outer")
        .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
        .select(col("b"), Det.rdetLong(log(
          ((coalesce(col("t"), lit(0L)) + 1).cast("double")
            * (col("rt") + 256).cast("double"))
            / ((coalesce(col("r"), lit(0L)) + 1).cast("double")
              * (col("tt") + 256).cast("double"))), 9).as("lr_e9"))
      perDoc.join(broadcast(ratios), "b")
        .groupBy("doc_id", "lang")
        .agg(sum("c").as("n_tokens"), sum(col("c") * col("lr_e9")).as("score_e9"))
        .orderBy(col("score_e9").desc, col("doc_id"))
        .limit(25)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("score_e9"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang, ${h32("w")} % 256 AS b
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> ''),
      per_doc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
                  FROM toks GROUP BY 1, 2),
      tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS t
              FROM toks WHERE lang = 'en' GROUP BY 1),
      raw AS (SELECT b, CAST(sum(c) AS BIGINT) AS r FROM per_doc GROUP BY 1),
      tt AS (SELECT CAST(sum(t) AS BIGINT) AS tt FROM tgt),
      rt AS (SELECT CAST(sum(r) AS BIGINT) AS rt FROM raw),
      dom AS (SELECT unnest(range(256)) AS b),
      ratios AS (
        SELECT dom.b, ${Det.rdetLongSql(
          """ln((CAST(COALESCE(t, 0) + 1 AS DOUBLE) * (rt + 256))
              / (CAST(COALESCE(r, 0) + 1 AS DOUBLE) * (tt + 256)))""", 9)}
            AS lr_e9
        FROM dom LEFT JOIN tgt ON dom.b = tgt.b
                 LEFT JOIN raw ON dom.b = raw.b
        CROSS JOIN tt CROSS JOIN rt),
      scored AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(c * lr_e9) AS BIGINT) AS score_e9
        FROM per_doc JOIN ratios USING (b) GROUP BY 1)
      SELECT s.doc_id, d.lang, s.n_tokens, s.score_e9
      FROM scored s JOIN documents d ON s.doc_id = d.doc_id
      ORDER BY s.score_e9 DESC, s.doc_id LIMIT 25"""))

  /** DATA-MIXTURE REBALANCING — given target domain weights (ppm, summing
    * to 10⁶) and a global budget of half the corpus, derive each language's
    * deterministic sampling rate and draw the sample by threshold on an
    * engine-portable hash of the doc id (the same "sampling is a pure
    * function of the key" rule every rerun-stable pipeline needs). Rates
    * are exact integer floor-division ppm, capped at 10⁶ — a language with
    * fewer documents than its target allocation contributes everything it
    * has and the shortfall is VISIBLE as want > n_sampled. One aggregate
    * for availability, one broadcast of the 5-row rate table, one
    * filter-aggregate for the draw; the corpus is never shuffled. Output
    * per language: availability, allocation, rate, achieved count, and the
    * sampled-key checksum replicas use to confirm they drew the same set.
    */
  val q189MixtureRebalance: QueryDef = QueryDef(
    "q189_mixture_rebalance",
    (s, dir) => {
      import s.implicits._
      val w = Seq(("en", 360000L), ("de", 160000L), ("es", 160000L),
        ("fr", 160000L), ("zh", 160000L)).toDF("lang", "w_ppm")
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"))
      val avail = docs.groupBy("lang").agg(count(lit(1)).as("n_avail"))
      val tot = avail.agg(sum("n_avail").as("n_total"))
      // integral `div`, not the make-divisible double `/` (exact only below
      // 2^53 — budget·w_ppm crosses that near ~2.5e10 documents while the
      // oracle's integer `//` stays exact). `div` is exact through int64;
      // the remaining bound is budget·w_ppm < 2^63 ⇔ ~9e12 documents,
      // beyond any 100 TB corpus of plausible document size.
      val rates = avail.join(broadcast(w), "lang").crossJoin(broadcast(tot))
        .withColumn("budget", expr("n_total div 2"))
        .withColumn("want", expr("(budget * w_ppm) div 1000000"))
        .withColumn("rate_ppm", least(lit(1000000L),
          expr("(want * 1000000) div n_avail")))
        .select(col("lang"), col("n_avail"), col("want"), col("rate_ppm"))
      docs.join(broadcast(rates), "lang")
        .filter(pmod(HashFunctions.hash32(
          concat(lit("mix#"), col("doc_id").cast("string"))), lit(1000000L))
          < col("rate_ppm"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("key_checksum"))
        .join(broadcast(rates), "lang")
        .select(col("lang"), col("n_avail"), col("want"), col("rate_ppm"),
          col("n_sampled"), col("key_checksum"))
        .orderBy("lang")
    },
    Some(s"""
      WITH w AS (SELECT * FROM (VALUES ('en', 360000), ('de', 160000),
                   ('es', 160000), ('fr', 160000), ('zh', 160000))
                   AS t(lang, w_ppm)),
      avail AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_avail
                FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n_avail) AS BIGINT) AS n_total FROM avail),
      rates AS (
        SELECT lang, n_avail,
               CAST(((n_total // 2) * w_ppm) // 1000000 AS BIGINT) AS want,
               CAST(least(1000000,
                 ((((n_total // 2) * w_ppm) // 1000000) * 1000000) // n_avail)
                 AS BIGINT) AS rate_ppm
        FROM avail JOIN w USING (lang) CROSS JOIN tot),
      drawn AS (
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(doc_id) AS BIGINT) AS key_checksum
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE ${h32("'mix#' || CAST(doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm
        GROUP BY 1)
      SELECT r.lang, r.n_avail, r.want, r.rate_ppm,
             d.n_sampled, d.key_checksum
      FROM drawn d JOIN rates r ON d.lang = r.lang
      ORDER BY r.lang"""))

  /** DOMINANT COVARIANCE EIGENVECTOR of the embedding table by POWER
    * ITERATION — the top principal direction, the statistic behind
    * whitening, drift detection, and "is this embedding space collapsing"
    * monitoring. The (unnormalized, n²-scaled) covariance C = n·Σqqᵀ − ssᵀ
    * comes from ONE pass over the quantized (×10⁴ long) coordinates with
    * ZERO joins: each vector's 64-element quantized array is exploded once
    * to (i, qᵢ, qarr) — 64 rows per vector, each still carrying the whole
    * array — and one 64-group hash aggregate computes row i of the moment
    * matrix (64 `sum(qᵢ·qarr[j])` buffers), the linear sums s1, and the
    * vector count simultaneously; partial aggregation collapses everything
    * map-side, so the corpus is never exchanged at all (the round-6 shape
    * self-joined (vec, i, q) on vec_id: two corpus-sized hash exchanges
    * plus 4096 joined rows per vector, buying nothing the in-row products
    * don't; measured 4.8 s → 2.6 s at sf0.1). Three matvec
    * iterations then run ENTIRELY on the 4096-row matrix relation
    * (broadcast-joined against the 64-row vector), renormalizing by the
    * max-|component| — floored at 1 so a degenerate all-identical corpus
    * (zero covariance) yields a zero vector instead of Spark null-vs-DuckDB
    * error divergence on m = 0 — with exact half-up integer division to
    * ×10⁶; no sqrt, no driver-side linear algebra, no convergence loop
    * whose trip count depends on data. The oracle unrolls the same three
    * iterations as CTEs in HUGEINT. Output: the 64 components of v₃ in
    * ×10⁶ fixed point (sign = whatever the all-ones start converges to —
    * identical arithmetic in both engines).
    */
  val q190PowerIteration: QueryDef = QueryDef(
    "q190_power_iteration",
    (s, dir) => {
      // moment sums accumulate as LONG (codegen'd hash agg): |q| < 2^15 so
      // per-term products are < 2^30 and the sum stays exact through 2^33
      // vectors; beyond that, interpose a per-shard long partial and a
      // DECIMAL(38,0) merge (two-level aggregate) — the quantities only
      // enter the D38 domain once, in the covariance combination below.
      // ONE corpus pass: row i of the moment matrix, the linear sums s1,
      // and the vector count all come out of the same 64-group aggregate
      // (64 input rows per vector, 66 sum buffers per group).
      val wide = Tables.load(s, dir, "embeddings")
        .select(transform(col("embedding"),
          e => floor(e.cast("double") * 10000 + 0.5).cast("long")).as("qarr"))
        .select(col("qarr"), posexplode(col("qarr")).as(Seq("i", "qi")))
        .groupBy("i")
        .agg(sum(col("qi")).as("lin"), (count(lit(1)).as("n") +:
          (0 until 64).map(j =>
            sum(col("qi") * element_at(col("qarr"), j + 1)).as(s"s$j"))): _*)
        .transform(graft.operators.ScopedCache.cache) // 64 rows atop the corpus scan; feeds the unpivot AND linj
      // cache: c is 64×64 rows but sits atop the corpus-sized moment scan —
      // each of the three matvec iterations references it (protocol #6)
      val c = wide
        .select(col("i"), col("lin"), col("n"),
          posexplode(array((0 until 64).map(j => col(s"s$j")): _*))
            .as(Seq("j", "s2")))
        .join(broadcast(wide.select(col("i").as("j"), col("lin").as("linj"))), "j")
        .select(col("i"), col("j"),
          (col("n").cast(D38) * col("s2").cast(D38)
            - col("lin").cast(D38) * col("linj").cast(D38)).as("c"))
        .transform(graft.operators.ScopedCache.cache)
      var v = s.range(0, 64).toDF("j").withColumn("v", lit(1000000L))
      for (_ <- 1 to 3) {
        val w = c.join(broadcast(v), "j")
          .groupBy("i").agg(sum(col("c") * col("v").cast(D38)).as("w"))
        val m = w.agg(max(abs(col("w"))).as("m"))
        // greatest(m, 1): zero covariance (degenerate corpus) would divide
        // by zero — Spark yields nulls, DuckDB raises on HUGEINT; the floor
        // makes both produce an exact zero vector
        v = w.crossJoin(broadcast(m))
          .select(col("i").as("j"),
            Det.ihalfUpSigned(col("w") * lit(1000000L).cast(D38),
              greatest(col("m"), lit(1).cast(D38))).as("v"))
      }
      v.select(col("j").cast("long").as("i"), col("v").as("v_e6")).orderBy("i")
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id, k AS i,
               CAST(floor(CAST(embedding[k + 1] AS DOUBLE) * 10000 + 0.5e0)
                 AS BIGINT) AS qv
        FROM (SELECT vec_id, embedding, unnest(range(len(embedding))) AS k
              FROM embeddings)),
      s2 AS (SELECT a.i AS i, b.i AS j,
                    CAST(sum(CAST(a.qv AS HUGEINT) * b.qv) AS HUGEINT) AS s2
             FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
      s1 AS (SELECT i, CAST(sum(CAST(qv AS HUGEINT)) AS HUGEINT) AS s1
             FROM q GROUP BY 1),
      nd AS (SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n FROM q),
      c AS (SELECT s2.i, s2.j, n * s2.s2 - a.s1 * b.s1 AS c
            FROM s2 JOIN s1 a ON s2.i = a.i JOIN s1 b ON s2.j = b.i
            CROSS JOIN nd),
      v0 AS (SELECT unnest(range(64)) AS j, CAST(1000000 AS HUGEINT) AS v),
      w1 AS (SELECT i, sum(c * v) AS w FROM c JOIN v0 USING (j) GROUP BY 1),
      m1 AS (SELECT max(abs(w)) AS m FROM w1),
      v1 AS (SELECT i AS j, ${Det.ihalfUpSignedSql("w * 1000000", "greatest(m, 1)")} AS v
             FROM w1 CROSS JOIN m1),
      w2 AS (SELECT i, sum(c * v) AS w FROM c JOIN v1 USING (j) GROUP BY 1),
      m2 AS (SELECT max(abs(w)) AS m FROM w2),
      v2 AS (SELECT i AS j, ${Det.ihalfUpSignedSql("w * 1000000", "greatest(m, 1)")} AS v
             FROM w2 CROSS JOIN m2),
      w3 AS (SELECT i, sum(c * v) AS w FROM c JOIN v2 USING (j) GROUP BY 1),
      m3 AS (SELECT max(abs(w)) AS m FROM w3),
      v3 AS (SELECT i AS j, ${Det.ihalfUpSignedSql("w * 1000000", "greatest(m, 1)")} AS v
             FROM w3 CROSS JOIN m3)
      SELECT CAST(j AS BIGINT) AS i, CAST(v AS BIGINT) AS v_e6
      FROM v3 ORDER BY i"""))

  /** EXCLUSIVE-BLAME SUPPLIERS — TPC-H Q21's semi+anti correlated shape
    * ("suppliers who failed an order where every OTHER supplier on the
    * order delivered"), adapted to this schema's return flag: for
    * multi-supplier orders with EXACTLY ONE supplier having returned lines,
    * count per supplier how many orders they alone spoiled. The classic
    * formulation is two correlated EXISTS subqueries against the fact
    * table; the scalable rewrite here aggregates ONCE to the
    * (order, supplier, had_return) pair grain — map-side partial aggs do
    * most of the work — then re-aggregates that small relation to per-order
    * stats and joins pair-grain to order-grain, so the fact table is
    * scanned and shuffled exactly once and no EXISTS is re-evaluated per
    * row. Top 20 by (blamed orders desc, name).
    */
  val q191ExclusiveBlame: QueryDef = QueryDef(
    "q191_exclusive_blame",
    (s, dir) => {
      val pairs = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("late"))
        .transform(graft.operators.ScopedCache.cache)
      val perOrder = pairs.groupBy("l_orderkey")
        .agg(count(lit(1)).as("ns"), sum("late").as("nr"))
        .filter(col("ns") > 1 && col("nr") === 1)
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      pairs.filter(col("late") === 1L)
        .join(perOrder, "l_orderkey")
        .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    },
    Some("""
      WITH pairs AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS late
        FROM lineitem GROUP BY 1, 2),
      per_order AS (
        SELECT l_orderkey, count(*) AS ns, sum(late) AS nr
        FROM pairs GROUP BY 1
        HAVING count(*) > 1 AND sum(late) = 1)
      SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM pairs p
      JOIN per_order o ON p.l_orderkey = o.l_orderkey
      JOIN supplier s ON p.l_suppkey = s.s_suppkey
      WHERE p.late = 1
      GROUP BY 1, 2
      ORDER BY numwait DESC, s.s_name LIMIT 20"""))

  val all: Seq[QueryDef] =
    Seq(q188ImportanceScore, q189MixtureRebalance, q190PowerIteration,
      q191ExclusiveBlame)
}
