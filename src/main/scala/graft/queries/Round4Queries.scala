package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det
import graft.functions.HashFunctions
import graft.operators.BloomPrune

/** Round-4 surface: bloom-accelerated semi-join pruning, PII redaction, and
  * character-entropy quality scoring. Determinism per [[graft.functions.Det]].
  */
object Round4Queries {

  private def h32(x: String): String = s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  /** Bloom-filter semi-join pruning ([[graft.operators.BloomPrune]]): high-
    * value orders' keys collapse to a compact bloom that prunes lineitem
    * map-side BEFORE the shuffle; the exact semi join then removes false
    * positives, so the result is plain `l_orderkey IN (...)` semantics. At
    * 100 TB this is the difference between shuffling every probe row and
    * shuffling only candidates.
    */
  val q112BloomPrune: QueryDef = QueryDef(
    "q112_bloom_prune",
    (s, dir) => {
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 150000.0).select(col("o_orderkey"))
      // expectedItems unset: the bloom sizes itself from the measured
      // build cardinality, tracking the filter's selectivity across sfs
      BloomPrune.semiJoin(Tables.load(s, dir, "lineitem"), col("l_orderkey"),
          hot, col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("qty_sum"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             ${Det.dsumSql("l_quantity")} AS qty_sum
      FROM lineitem
      WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0e0)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** PII redaction — the scrubbing pass every training corpus needs before
    * the tokenizer sees it. Deterministic synthetic PII (an email and a
    * phone derived from doc_id) is appended to each document, then masked
    * with single-pass regexp_replace; emitted are the match counts and the
    * redacted tail proving the masks landed. Pure codegen'd string
    * expressions — embarrassingly parallel, no shuffle until the final sort.
    * (Patterns stay in the Java-regex ∩ RE2 common dialect so both engines
    * match identical spans.)
    */
  val q113PiiRedact: QueryDef = QueryDef(
    "q113_pii_redact",
    (s, dir) => {
      val withPii = Tables.load(s, dir, "documents")
        .withColumn("txt", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com tel +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      graft.operators.TextAnalysis.redactPii(withPii, "txt")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).cast("long").as("red_len"),
          expr("right(redacted, 40)").as("red_tail"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id,
                   text || ' contact user' || doc_id || '@example.com tel +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
                 FROM documents),
      r AS (SELECT doc_id, txt,
              regexp_replace(
                regexp_replace(txt,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\+[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS redacted
            FROM t)
      SELECT doc_id,
             CAST(len(regexp_extract_all(txt,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
               AS n_emails,
             CAST(len(regexp_extract_all(txt,
               '\+[0-9][0-9-]{6,}[0-9]')) AS INTEGER) AS n_phones,
             CAST(len(redacted) AS BIGINT) AS red_len,
             right(redacted, 40) AS red_tail
      FROM r ORDER BY doc_id"""))

  /** Character-entropy quality scoring: H = log2(L) − (Σ c·log2 c)/L over
    * per-document character counts — the cheap gibberish/boilerplate
    * detector (near-zero entropy = repeated filler, max entropy = random
    * bytes). The inner sum is a sequential fold over counts sorted by
    * character, so both engines add identical terms in identical order; one
    * hash aggregation per stage, no windows.
    */
  val q114CharEntropy: QueryDef = QueryDef(
    "q114_char_entropy",
    (s, dir) => {
      val counts = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      counts.groupBy("doc_id")
        .agg(sum("c").as("len"), count(lit(1)).as("n_distinct"),
          aggregate(
            transform(array_sort(collect_list(struct(col("ch"), col("c")))),
              x => x.getField("c").cast("double")),
            lit(0.0d), (acc, n) => acc + n * log2(n)).as("s"))
        .select(col("doc_id"), col("len"), col("n_distinct").cast("long").as("n_distinct"),
          Det.rdet(log2(col("len")) - col("s") / col("len"), 6).as("entropy"))
        .orderBy("doc_id")
    },
    Some("""
      WITH counts AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
        WHERE ch != '' GROUP BY doc_id, ch),
      agg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS len,
               CAST(count(*) AS BIGINT) AS n_distinct,
               list_reduce(
                 list_prepend(0.0e0,
                   list_transform(list(CAST(c AS DOUBLE) ORDER BY ch),
                     n -> n * log2(n))),
                 (acc, x) -> acc + x) AS s
        FROM counts GROUP BY doc_id)
      SELECT doc_id, len, n_distinct,
             floor((log2(len) - s / len) * 1e6 + 0.5) / 1e6 AS entropy
      FROM agg ORDER BY doc_id"""))

  /** One PageRank iteration as oracle CTEs: c$k = per-node contribution sum
    * over in-edges, p$k = damped update. Mirrors [[graft.operators.Graph]]'s
    * integer recurrence term for term.
    */
  private def prIterCtes(k: Int): String = {
    val prev = s"p${k - 1}"
    s"""c$k AS (SELECT e.dst AS v, CAST(SUM(p // d) AS BIGINT) AS s
       |  FROM e JOIN $prev ON e.src = $prev.v JOIN deg ON e.src = deg.src
       |  GROUP BY e.dst),
       |p$k AS (SELECT nodes.v,
       |    CAST(150000000 // n + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS p
       |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.v = c$k.v)"""
      .stripMargin.replace("\n", " ")
  }

  /** PageRank over the supplier→part-bucket co-occurrence graph
    * ([[graft.operators.Graph.pageRank]], 3 iterations). Rank mass is
    * integer-quantized (units of 1e-9), so the distributed fixpoint is
    * bit-identical to the oracle's unrolled CTE chain — iterative graph
    * analytics under the same determinism protocol as the k-means fit.
    */
  val q115PageRank: QueryDef = QueryDef(
    "q115_pagerank",
    (s, dir) => {
      val edges = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("src"), (col("l_partkey") % 100).as("dst"))
      graft.operators.Graph.pageRank(edges, 3).orderBy("v")
    },
    Some(s"""
      WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                   CAST(l_partkey % 100 AS BIGINT) AS dst FROM lineitem),
      nodes AS (SELECT DISTINCT v FROM
                  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      p0 AS (SELECT v, CAST(1000000000 // n AS BIGINT) AS p
             FROM nodes CROSS JOIN nn),
      ${prIterCtes(1)},
      ${prIterCtes(2)},
      ${prIterCtes(3)}
      SELECT v, p FROM p3 ORDER BY v"""))

  /** 3×3 determinant — one textual form instantiated for every Cramer
    * column swap, so both engines build the identical IEEE expression tree.
    */
  private def det3Sql(a: String, b: String, c: String, d: String, e: String,
                      f: String, g: String, h: String, i: String): String =
    s"($a*($e*$i - $f*$h) - $b*($d*$i - $f*$g) + $c*($d*$h - $e*$g))"

  /** The Cramer solve over a 1-row moments relation `m` with columns
    * n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy. Shared verbatim between
    * the Spark side (spark.sql over a temp view) and the DuckDB oracle, so
    * the scalar double arithmetic is the same expression text in both.
    */
  private def olsSolveSql(m: String): String = {
    val d = det3Sql("nD", "s1D", "s2D", "s1D", "s11D", "s12D", "s2D", "s12D", "s22D")
    val d0 = det3Sql("syD", "s1D", "s2D", "s1yD", "s11D", "s12D", "s2yD", "s12D", "s22D")
    val d1 = det3Sql("nD", "syD", "s2D", "s1D", "s1yD", "s12D", "s2D", "s2yD", "s22D")
    val d2 = det3Sql("nD", "s1D", "syD", "s1D", "s11D", "s1yD", "s2D", "s12D", "s2yD")
    s"""
      SELECT n,
             floor(w0 * 1e6 + 0.5e0) / 1e6 AS w0,
             floor(w1 * 1e6 + 0.5e0) / 1e6 AS w1,
             floor(w2 * 1e6 + 0.5e0) / 1e6 AS w2,
             floor((1.0e0 - (syyD - (w0*syD + w1*s1yD + w2*s2yD))
                          / (syyD - syD*syD/nD)) * 1e6 + 0.5e0) / 1e6 AS r2
      FROM (
        SELECT n, syD, s1yD, s2yD, syyD, nD,
               $d0 / $d AS w0, $d1 / $d AS w1, $d2 / $d AS w2
        FROM (
          SELECT n,
                 CAST(n AS DOUBLE) AS nD, CAST(s1 AS DOUBLE) AS s1D,
                 CAST(s2 AS DOUBLE) AS s2D, CAST(s11 AS DOUBLE) AS s11D,
                 CAST(s12 AS DOUBLE) AS s12D, CAST(s22 AS DOUBLE) AS s22D,
                 CAST(sy AS DOUBLE) AS syD, CAST(s1y AS DOUBLE) AS s1yD,
                 CAST(s2y AS DOUBLE) AS s2yD, CAST(syy AS DOUBLE) AS syyD
          FROM $m) casts) solved"""
  }

  /** Distributed ordinary least squares, closed form: ONE aggregation pass
    * collapses lineitem to exact integer moments (n, Σx, Σxx, Σxy — int64
    * sums are order-independent, so the moments are partition-invariant),
    * then the 3×3 normal equations solve by Cramer's rule as scalar IEEE
    * arithmetic both engines evaluate from identical expression text
    * ([[olsSolveSql]]). Model: price ≈ w0 + w1·quantity + w2·(100·discount),
    * with R² from the same moments (SSE = Σyy − wᵀXᵀb). This is how
    * regression actually runs at 100 TB — a map-side-combined aggregate and
    * a constant-size solve, not an iterative row-level pass.
    *
    * y is quantized to whole dollars so Σy² stays below 2^53: int64→double
    * is then correctly rounded in every engine (DECIMAL→double is not —
    * see Det.dsum). The fixture's columns are mutually independent by
    * construction, so R² ≈ 0 — the exhibit is the exact distributed solve,
    * not the fit quality.
    */
  val q116OlsRegression: QueryDef = QueryDef(
    "q116_ols_regression",
    (s, dir) => {
      val t = Tables.load(s, dir, "lineitem").select(
        floor(col("l_quantity") + 0.5).cast("long").as("x1"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("x2"),
        floor(col("l_extendedprice") + 0.5).cast("long").as("y"))
      t.agg(
        count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"), sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
        .createOrReplaceTempView("ols_m116")
      s.sql(olsSolveSql("ols_m116"))
    },
    Some(s"""
      WITH t AS (SELECT CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS x1,
                        CAST(floor(l_discount * 100 + 0.5e0) AS BIGINT) AS x2,
                        CAST(floor(l_extendedprice + 0.5e0) AS BIGINT) AS y
                 FROM lineitem),
      ols_m116 AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(x1*x1) AS BIGINT) AS s11,
                   CAST(SUM(x1*x2) AS BIGINT) AS s12,
                   CAST(SUM(x2*x2) AS BIGINT) AS s22,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1*y) AS BIGINT) AS s1y,
                   CAST(SUM(x2*y) AS BIGINT) AS s2y,
                   CAST(SUM(y*y) AS BIGINT) AS syy
            FROM t)
      ${olsSolveSql("ols_m116")}"""))

  /** One BPE vocabulary-induction step: corpus-weighted adjacent character
    * pair counts (the argmax pair is what a byte-pair-encoding trainer would
    * merge next). Word frequencies aggregate FIRST, so pair extraction runs
    * once per distinct word, not once per occurrence — the same distinct-
    * before-expensive ordering the dedup family uses. Top-20 by (count desc,
    * pair asc) compiles to TakeOrderedAndProject, no global sort.
    */
  val q117BpePairs: QueryDef = QueryDef(
    "q117_bpe_pairs",
    (s, dir) => {
      val words = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("wc"))
      words
        // adjacent char pairs = all 2-char windows; the native expression
        // replaces the per-position substring() form (each substring
        // re-scans the UTF8String — harmless at word length, but the r16
        // audit removes the pattern everywhere)
        .select(col("wc"),
          explode(graft.plans.WindowSubstrings(col("w"), 2)).as("pair"))
        .groupBy("pair").agg(sum("wc").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    },
    Some("""
      WITH words AS (SELECT w, CAST(count(*) AS BIGINT) AS wc
                     FROM (SELECT unnest(string_split(text, ' ')) AS w
                           FROM documents)
                     WHERE len(w) >= 2 GROUP BY w),
      pairs AS (SELECT wc, unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> substr(w, i, 1) || substr(w, i + 1, 1))) AS pair
                FROM words)
      SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt
      FROM pairs GROUP BY pair
      ORDER BY cnt DESC, pair LIMIT 20"""))

  /** Cross-document segment-level dedup — the RefinedWeb/C4-style exact
    * substring remover at segment granularity (recurring runs of text across
    * documents are boilerplate: navigation chrome, license headers,
    * templates). Documents split into disjoint 5-word segments; a segment
    * is "shared" when ≥2 distinct documents contain it. Segments shuffle as
    * 32-bit hashes, never as text; emits per-document counts and the shared
    * fraction a boilerplate filter would act on.
    */
  val q118SegmentDedup: QueryDef = QueryDef(
    "q118_segment_dedup",
    (s, dir) => {
      val seg = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(CAST(0 AS BIGINT), CAST(floor((size(ws) - 1) / 5) AS BIGINT))," +
            " k -> array_join(slice(ws, CAST(5 * k + 1 AS INT), 5), ' '))")).as("seg"))
        .filter(length(col("seg")) > 0)
        .select(col("doc_id"), HashFunctions.hash32(col("seg")).as("sh"))
      val shared = seg.groupBy("sh")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select(col("sh"), lit(1).as("is_shared"))
      seg.join(shared, Seq("sh"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_seg"), count(col("is_shared")).as("n_shared"))
        .select(col("doc_id"), col("n_seg"), col("n_shared"),
          Det.rdet(col("n_shared").cast("double") / col("n_seg"), 6)
            .as("shared_frac"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH seg0 AS (SELECT doc_id,
                      unnest(list_transform(
                        generate_series(0, CAST(floor((len(ws) - 1) / 5) AS BIGINT)),
                        k -> array_to_string(ws[5*k+1:5*k+5], ' '))) AS seg
                    FROM (SELECT doc_id, string_split(text, ' ') AS ws
                          FROM documents)),
      seg AS (SELECT doc_id, ${h32("seg")} AS sh FROM seg0 WHERE len(seg) > 0),
      shared AS (SELECT sh, 1 AS is_shared FROM seg GROUP BY sh
                 HAVING count(DISTINCT doc_id) >= 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
             CAST(count(shared.is_shared) AS BIGINT) AS n_shared,
             floor((CAST(count(shared.is_shared) AS DOUBLE) / count(*)) * 1e6
               + 0.5) / 1e6 AS shared_frac
      FROM seg LEFT JOIN shared ON seg.sh = shared.sh
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Salted skew join ([[graft.operators.SkewJoin]]), oracle-checked: the
    * fact side splits each join key into 8 deterministic sub-keys and the
    * dimension replicates into every bucket, so a hot key spreads across 8
    * reducers instead of one — and the result is EXACTLY the plain join
    * (the oracle is the unsalted SQL). The manual fallback for skew AQE
    * can't see (post-transform skew, aggregate-free hash joins).
    */
  val q119SaltedJoin: QueryDef = QueryDef(
    "q119_salted_join",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      graft.operators.SkewJoin.saltedJoin(
          orders, customer, col("o_custkey"), col("c_custkey"),
          col("o_orderkey"), saltBuckets = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             ${Det.dsumSql("o_totalprice")} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Exact percentiles at scale via the distributed global rank: the
    * element with rank ceil(p·n) under a total order, selected by
    * [[graft.operators.Ranks]] instead of a single-node sort-based
    * percentile aggregate (q41's shape — correct, but its ObjectHashAggregate
    * funnels the whole column through one final reducer; this form's only
    * data-sized operation is one range exchange). Rank cutoffs use integer
    * ceil arithmetic ((n·k + 99) div 100) so both engines pick identical
    * elements.
    */
  val q120PercentileRank: QueryDef = QueryDef(
    "q120_percentile_rank",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_extendedprice").as("v"),
          col("l_orderkey"), col("l_linenumber"))
      val ranked = graft.operators.Ranks.globalRowNumber(
        li, Seq(col("v"), col("l_orderkey"), col("l_linenumber")), "i")
      val total = li.groupBy().agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(total))
        .withColumn("pct", when(col("i") === expr("(n * 25 + 99) div 100"), 25)
          .when(col("i") === expr("(n * 50 + 99) div 100"), 50)
          .when(col("i") === expr("(n * 75 + 99) div 100"), 75)
          .when(col("i") === expr("(n * 90 + 99) div 100"), 90))
        .filter(col("pct").isNotNull)
        .select(col("pct").cast("int").as("pct"), col("i").as("rank"), col("v"))
        .orderBy("pct")
    },
    Some("""
      WITH ranked AS (SELECT l_extendedprice AS v,
               CAST(row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                 l_linenumber) AS BIGINT) AS i,
               CAST(count(*) OVER () AS BIGINT) AS n
             FROM lineitem)
      SELECT pct, i AS rank, v FROM (
        SELECT v, i,
               CASE WHEN i = (n * 25 + 99) // 100 THEN 25
                    WHEN i = (n * 50 + 99) // 100 THEN 50
                    WHEN i = (n * 75 + 99) // 100 THEN 75
                    WHEN i = (n * 90 + 99) // 100 THEN 90 END AS pct
        FROM ranked)
      WHERE pct IS NOT NULL ORDER BY pct"""))

  val all: Seq[QueryDef] =
    Seq(q112BloomPrune, q113PiiRedact, q114CharEntropy, q115PageRank,
      q116OlsRegression, q117BpePairs, q118SegmentDedup, q119SaltedJoin,
      q120PercentileRank)
}
