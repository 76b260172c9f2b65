package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Det, HashFunctions}
import graft.functions.HashFunctions.MinhashParams
import graft.operators.Dedup

/** Round-6 surface: a TPC-H Q8-style market-share flagship (two nation
  * roles + conditional share over a 7-table join), corpus-level source
  * overlap, a Heaps'-law vocabulary growth curve, the containment
  * (overlap-coefficient) join, and train/test split-leakage detection.
  * Determinism per [[graft.functions.Det]] and the NOTES.md protocol.
  */
object Round6Queries {

  private def h32(x: String): String =
    s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  private def sigExpr(i: Int): String = {
    val (a, b) = MinhashParams(i)
    s"list_min(list_transform(sh, t -> ($a * ${h32("t")} + $b) % 2147483647))"
  }

  /** TPC-H Q8-flavored MARKET SHARE: revenue by supplier nation and order
    * year for one part type sold into one customer region, plus each
    * nation's share of its year. The 100 TB plan is the exhibit: part,
    * supplier⋈nation, and customer⋈nation⋈region are all BROADCAST dims
    * (the part filter prunes before the fact join), so the only corpus
    * shuffles are lineitem⋈orders on the orderkey and the final (year,
    * nation) aggregate; the per-year denominator is a window over the tiny
    * (7 years × 25 nations) aggregate, never a second fact scan. Revenue
    * accumulates as exact CENTS (floor(v·100+0.5) longs — order-independent
    * and < 2^53, so the share's double division is bit-identical
    * cross-engine); no double is ever summed.
    */
  val q162MarketShare: QueryDef = QueryDef(
    "q162_market_share",
    (s, dir) => {
      val nation = Tables.load(s, dir, "nation")
      val suppDim = broadcast(Tables.load(s, dir, "supplier")
        .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation")))
      val partDim = broadcast(Tables.load(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey"))
      val custDim = broadcast(Tables.load(s, dir, "customer")
        .join(broadcast(nation.select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey"))
      val rev = Tables.load(s, dir, "lineitem")
        .join(partDim, col("l_partkey") === col("p_partkey"))
        .join(suppDim, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custDim, col("o_custkey") === col("c_custkey"))
        .select(year(col("o_orderdate")).as("o_year"), col("supp_nation"),
          floor(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("v"))
      val per = rev.groupBy("o_year", "supp_nation")
        .agg(count(lit(1)).as("n_items"), sum(col("v")).as("revenue_cents"))
      per.withColumn("year_cents", sum(col("revenue_cents")).over(Window.partitionBy("o_year")))
        .select(col("o_year"), col("supp_nation"), col("n_items"), col("revenue_cents"),
          Det.rdetLong(col("revenue_cents").cast("double") / col("year_cents").cast("double"), 6)
            .as("share_e6"))
        .orderBy("o_year", "supp_nation")
    },
    Some("""
      WITH sn AS (SELECT s_suppkey, n_name AS supp_nation
                  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
      ac AS (SELECT c_custkey FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA'),
      rev AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, supp_nation,
                     CAST(floor(l_extendedprice * (1e0 - l_discount) * 100e0 + 0.5e0)
                       AS BIGINT) AS v
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN sn ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN ac ON o_custkey = c_custkey
              WHERE p_type = 'ECONOMY'),
      per AS (SELECT o_year, supp_nation, CAST(count(*) AS BIGINT) AS n_items,
                     CAST(SUM(v) AS BIGINT) AS revenue_cents
              FROM rev GROUP BY 1, 2)
      SELECT o_year, supp_nation, n_items, revenue_cents,
             CAST(floor((CAST(revenue_cents AS DOUBLE)
               / CAST(SUM(revenue_cents) OVER (PARTITION BY o_year) AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT) AS share_e6
      FROM per ORDER BY o_year, supp_nation"""))

  /** Cross-SOURCE overlap matrix — corpus-level contamination between
    * domains (which crawl slices / data vendors duplicate each other),
    * the aggregate view the per-pair dedup queries can't give. For every
    * source pair: shared distinct shingles and the shingle-set Jaccard.
    * Scale shape: one distinct over (source, shingle-hash) — the
    * decontamination shuffle — then a per-shingle collect_set whose state
    * is bounded by the SOURCE COUNT (not document frequency), an explode
    * of at most C(n_src, 2) pairs per shingle, and a count. The corpus
    * square never appears; output is n_src² rows.
    */
  val q163SourceOverlap: QueryDef = QueryDef(
    "q163_source_overlap",
    (s, dir) => {
      val sh = Tables.load(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("source"), explode(Dedup.hashedShingles(col("text"), 3)).as("h"))
        .distinct()
      val per = sh.groupBy("source").agg(count(lit(1)).as("n"))
      val pairs = sh.groupBy("h")
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .select(explode(expr(
          "flatten(transform(ss, (a, i) ->" +
            " transform(slice(ss, i + 2, size(ss)), b -> struct(a AS src_a, b AS src_b))))"))
          .as("p"))
        .select(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
      pairs
        .join(per.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(per.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("shared"),
          Det.rdet(col("shared").cast("double") /
            (col("n_a") + col("n_b") - col("shared")), 6).as("jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                 FROM documents WHERE len(string_split(text, ' ')) >= 3),
      e AS (SELECT DISTINCT source,
                   ${h32("array_to_string(list_slice(ws, i, i + 2), ' ')")} AS h
            FROM w, unnest(generate_series(1, len(ws) - 2)) AS u(i)),
      per AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
      sh AS (SELECT a.source AS src_a, b.source AS src_b,
                    CAST(count(*) AS BIGINT) AS shared
             FROM e a JOIN e b ON a.h = b.h AND a.source < b.source
             GROUP BY 1, 2)
      SELECT src_a, src_b, pa.n AS n_a, pb.n AS n_b, shared,
             floor((CAST(shared AS DOUBLE) / (pa.n + pb.n - shared)) * 1e6 + 0.5)
               / 1e6 AS jaccard
      FROM sh JOIN per pa ON pa.source = src_a JOIN per pb ON pb.source = src_b
      ORDER BY src_a, src_b"""))

  /** Heaps'-law VOCABULARY GROWTH — distinct-token count as the corpus
    * accumulates, the curve that tells a data-mixing run when a source's
    * marginal vocabulary is exhausted. Each token's FIRST document (one
    * min-aggregate over the token explode — the inverted-index shuffle)
    * assigns it to one of 32 doc_id-range buckets; per-bucket new-token
    * counts then cumulative-sum across the 32-ROW bucket relation. The
    * growth window runs over bucket counts, never over documents — and its
    * partition key is the non-foldable `bucket * 0` (a foldable lit(0)
    * would be stripped by Spark 4's EliminateWindowPartitions into a
    * genuinely unpartitioned window; the PlanSpec sweep pins this).
    */
  val q164VocabGrowth: QueryDef = QueryDef(
    "q164_vocab_growth",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val wdt = docs.agg((floor(max("doc_id") / 32.0d) + 1).cast("long").as("wdt"))
      val tk = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      val firstDoc = tk.groupBy("t").agg(min("doc_id").as("fd"))
      val newPer = firstDoc.crossJoin(broadcast(wdt))
        .groupBy(floor(col("fd") / col("wdt")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_new"))
      val docsPer = docs.crossJoin(broadcast(wdt))
        .groupBy(floor(col("doc_id") / col("wdt")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"))
      val grow = Window.partitionBy(col("bucket") * 0).orderBy("bucket")
      docsPer.join(newPer, Seq("bucket"), "left_outer")
        .na.fill(0L, Seq("n_new"))
        .withColumn("cum_vocab", sum(col("n_new")).over(grow))
        .select("bucket", "n_docs", "n_new", "cum_vocab")
        .orderBy("bucket")
    },
    Some("""
      WITH mx AS (SELECT CAST(floor(max(doc_id) / 32.0e0) + 1 AS BIGINT) AS wdt
                  FROM documents),
      tk AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
             FROM documents),
      fo AS (SELECT t, min(doc_id) AS fd FROM tk GROUP BY t),
      nb AS (SELECT CAST(floor(fd / (1e0 * wdt)) AS BIGINT) AS bucket,
                    CAST(count(*) AS BIGINT) AS n_new
             FROM fo CROSS JOIN mx GROUP BY 1),
      nd AS (SELECT CAST(floor(doc_id / (1e0 * wdt)) AS BIGINT) AS bucket,
                    CAST(count(*) AS BIGINT) AS n_docs
             FROM documents CROSS JOIN mx GROUP BY 1)
      SELECT nd.bucket AS bucket, n_docs,
             COALESCE(n_new, 0) AS n_new,
             CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY nd.bucket) AS BIGINT)
               AS cum_vocab
      FROM nd LEFT JOIN nb ON nd.bucket = nb.bucket
      ORDER BY bucket"""))

  /** CONTAINMENT dedup — quote/subset detection (see
    * [[graft.operators.Dedup.containmentPairs]] for the prefix × full-index
    * candidate scheme and its recall proof). tau = 0.7 so partially-edited
    * embeddings of one doc inside another qualify, not only verbatim
    * quotes. Same trigram tokens as q134; the brute-force oracle verifies
    * the exact pair set.
    */
  val q165Containment: QueryDef = QueryDef(
    "q165_containment",
    (s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"), 0.7e0)
        .withColumn("contain", Det.rdet(col("contain"), 6))
        .orderBy("i", "j"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                 WHERE len(string_split(text, ' ')) >= 3),
      tok AS (SELECT DISTINCT doc_id,
                     (('0x' || substr(md5(ws[i] || '_' || ws[i+1] || '_' || ws[i+2]), 1, 8))::BIGINT) AS h
              FROM w, unnest(range(1, len(ws) - 1)) AS u(i)),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
      inter AS (SELECT a.doc_id AS i, b.doc_id AS j, CAST(count(*) AS BIGINT) AS c
                FROM tok a JOIN tok b ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT i, j, sa.n AS la, sb.n AS lb, c AS inter,
             least(sa.n, sb.n) AS m_min,
             floor((CAST(c AS DOUBLE) / least(sa.n, sb.n)) * 1e6 + 0.5) / 1e6
               AS contain
      FROM inter JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
      WHERE CAST(c AS DOUBLE) / least(sa.n, sb.n) >= 0.7e0
      ORDER BY i, j"""))

  /** TRAIN/TEST SPLIT LEAKAGE — near-duplicate pairs that CROSS the q155
    * stratified split, the check that catches evaluation contamination
    * before a training run does. Pairs come from the LSH band join (q26's
    * operator — banded candidates, never corpus²); the split assignment
    * joins on as two broadcast-sized lookups. A clean corpus returns only
    * the planted near-dups that straddled the hash split.
    */
  val q166SplitLeakage: QueryDef = QueryDef(
    "q166_split_leakage",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val w = Window.partitionBy("source").orderBy("h", "doc_id")
      val wn = Window.partitionBy("source")
      val split = docs
        .select(col("doc_id"), col("source"),
          HashFunctions.hash32(concat(lit("d"), col("doc_id").cast("string"))).as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .select(col("doc_id"),
          when(col("rn") * 10 <= col("n") * 8, "train")
            .when(col("rn") * 10 <= col("n") * 9, "val")
            .otherwise("test").as("split"))
      Dedup.minhashLsh(docs, shingleK = 3, rowsPerBand = 2, threshold = 0.5)
        .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
        .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
        .filter(col("split_a") =!= col("split_b"))
        .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
          Det.rdet(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH hs0 AS (SELECT doc_id, source,
                     ('0x' || substr(md5('d' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
                   FROM documents),
      spl AS (SELECT doc_id,
                CASE WHEN rn * 10 <= n * 8 THEN 'train'
                     WHEN rn * 10 <= n * 9 THEN 'val'
                     ELSE 'test' END AS split
              FROM (SELECT doc_id,
                      CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                        AS BIGINT) AS rn,
                      CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
                    FROM hs0)),
      w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      s AS (SELECT doc_id,
              list_distinct(list_transform(generate_series(1, len(w)-2),
                i -> array_to_string(list_slice(w, i, i+2), ' '))) AS sh
            FROM w WHERE len(w) >= 3),
      sig AS (SELECT doc_id,
                list_distinct(list_transform(sh, t -> ${h32("t")})) AS hs,
                [${(0 until 8).map(sigExpr).mkString(", ")}] AS sg FROM s),
      bands AS (SELECT doc_id, b,
                  sg[2*b+1]::VARCHAR || '_' || sg[2*b+2]::VARCHAR AS key
                FROM sig, generate_series(0, 3) g(b)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
      pairs AS (SELECT doc_a, doc_b, jaccard FROM (
                  SELECT doc_a, doc_b,
                         CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                           / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
                           AS jaccard
                  FROM cand JOIN sig sa ON sa.doc_id = doc_a
                            JOIN sig sb ON sb.doc_id = doc_b)
                WHERE jaccard >= 0.5e0)
      SELECT doc_a, doc_b, pa.split AS split_a, pb.split AS split_b,
             floor(jaccard * 1e6 + 0.5) / 1e6 AS jaccard
      FROM pairs JOIN spl pa ON pa.doc_id = doc_a
                 JOIN spl pb ON pb.doc_id = doc_b
      WHERE pa.split != pb.split
      ORDER BY doc_a, doc_b"""))

  /** JOIN-SIZE ESTIMATION from sketches — the optimizer statistic that
    * decides broadcast-vs-shuffle and join order BEFORE running the join:
    * |R ⋈ S| = Σ_k f_R(k)·f_S(k) is exactly the inner product of the two
    * key-frequency vectors, and the count-min sketches of the two sides
    * (d=4 rows × w=512 buckets, q129's family) estimate it as
    * min_r Σ_b A[r][b]·B[r][b] — each row over-estimates by collision
    * noise only, so the min tightens (AMS/count-min inner-product
    * estimator). Each row's raw estimate carries expected collision mass
    * (n_A·n_B − truth)/w, so the DEBIASED form (w·est − n_A·n_B)/(w − 1)
    * — the unbiased solve of that expectation — is emitted beside it
    * (floor'd via exact-representable doubles, both engines identical).
    * w = 4096 keeps the noise term under the signal for these key counts;
    * measured at sf0.01 the raw rows over-estimate 1.3–1.4× and the
    * debiased ones land within 0.3–8% of truth. Scale shape: each side's sketch is
    * ONE map-side-combinable hash aggregate with O(d·w) state (the 128 KB
    * a streaming collector would keep — q129/streamingCountMin family);
    * the estimate then joins two (d·w)-row relations — the fact tables
    * are never joined. The EXACT inner product (one key join of the two
    * frequency tables) rides along as the exhibit's ground truth.
    */
  val q167JoinSizeSketch: QueryDef = QueryDef(
    "q167_join_size_sketch",
    (s, dir) => {
      val positions = Seq(1, 9, 17, 25)
      val w = 4096
      def sketch(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column) = {
        val k = concat(lit("k"), key.cast("string"))
        df.select(explode(array(positions.zipWithIndex.map { case (p, i) =>
            struct(lit(i).as("r"), (HashFunctions.hash32At(k, p) % w).cast("int").as("b"))
          }: _*)).as("c"))
          .groupBy(col("c.r").as("r"), col("c.b").as("b"))
          .agg(count(lit(1)).as("n"))
      }
      val ev = Tables.load(s, dir, "events")
      val ord = Tables.load(s, dir, "orders")
      val est = sketch(ev, col("user_id")).as("a")
        .join(sketch(ord, col("o_custkey")).as("b"),
          col("a.r") === col("b.r") && col("a.b") === col("b.b"))
        .groupBy(col("a.r").as("r"))
        .agg(sum(col("a.n") * col("b.n")).as("est_size"))
      val exact = ev.groupBy(col("user_id").as("k")).agg(count(lit(1)).as("fa"))
        .join(ord.groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("fb")), "k")
        .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_size"))
      val totals = ev.agg(count(lit(1)).as("na"))
        .crossJoin(ord.agg(count(lit(1)).as("nb")))
      est.crossJoin(broadcast(exact)).crossJoin(broadcast(totals))
        .select(col("r"), col("est_size"),
          // all operands exact-representable doubles (< 2^53): identical
          // floor'd quotient in both engines, negative-safe
          floor((lit(w) * col("est_size") - col("na") * col("nb")).cast("double")
            / lit((w - 1).toDouble)).cast("long").as("debiased_size"),
          col("exact_size"),
          Det.rdetLong(col("est_size").cast("double") / col("exact_size").cast("double"), 6)
            .as("ratio_e6"))
        .orderBy("r")
    },
    Some("""
      WITH pos(r, p) AS (VALUES (0, 1), (1, 9), (2, 17), (3, 25)),
      ea AS (SELECT r, (('0x' || substr(md5('k' || CAST(user_id AS VARCHAR)), p, 8))::BIGINT)
                      % 4096 AS b,
                    CAST(count(*) AS BIGINT) AS n
             FROM events CROSS JOIN pos GROUP BY 1, 2),
      eb AS (SELECT r, (('0x' || substr(md5('k' || CAST(o_custkey AS VARCHAR)), p, 8))::BIGINT)
                      % 4096 AS b,
                    CAST(count(*) AS BIGINT) AS n
             FROM orders CROSS JOIN pos GROUP BY 1, 2),
      est AS (SELECT ea.r AS r, CAST(SUM(ea.n * eb.n) AS BIGINT) AS est_size
              FROM ea JOIN eb ON ea.r = eb.r AND ea.b = eb.b GROUP BY 1),
      ex AS (SELECT CAST(COALESCE(SUM(fa * fb), 0) AS BIGINT) AS exact_size FROM
               (SELECT user_id AS k, count(*) AS fa FROM events GROUP BY 1) a
               JOIN (SELECT o_custkey AS k, count(*) AS fb FROM orders GROUP BY 1) b
               USING (k)),
      tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS na,
                     (SELECT CAST(count(*) AS BIGINT) FROM orders) AS nb)
      SELECT r, est_size,
             CAST(floor(CAST(4096 * est_size - na * nb AS DOUBLE) / 4095e0) AS BIGINT)
               AS debiased_size,
             exact_size,
             CAST(floor((CAST(est_size AS DOUBLE) / CAST(exact_size AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT) AS ratio_e6
      FROM est CROSS JOIN ex CROSS JOIN tot ORDER BY r"""))

  /** HLL SET INTERSECTION via inclusion–exclusion — the sketch-family
    * member q132 (estimate) and q141 (union rollup) don't cover: distinct
    * keys SHARED between two groups, answered from the register tables
    * alone. |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) comes from
    * the register-wise MAX of the two groups' tables — the merge HLL
    * exists for; no data re-scan. The register relation is q132's (one
    * hash aggregate, 256-entry mergeable state per group); the pair union
    * is a (pair, idx) max-aggregate over ≤ 2·256 rows per pair. Every
    * 2^−M term is a binary fraction (lsb ≥ 2^−25, totals < 256), so all
    * three harmonic sums are exact, order-independent doubles — the
    * estimator is bit-identical cross-engine (q132's protocol). The exact
    * intersection rides along from the distinct (flag, pk) relation —
    * self-joined on pk, ≤ #flags rows per key — exposing the
    * inclusion–exclusion error (NEGATIVE estimates are possible and
    * honest: the raw estimator's noise exceeds a small true overlap).
    */
  val q168HllIntersect: QueryDef = QueryDef(
    "q168_hll_intersect",
    (s, dir) => {
      val alpha = 0.7213e0 / (1e0 + 1.079e0 / 256e0)
      // keyed on l_orderkey, NOT l_partkey: every flag touches every part
      // even at sf0.01 (degenerate A = B = A∪B), while an order's handful
      // of lineitems carries a SUBSET of flags — real partial overlap
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_orderkey").as("pk"))
      val reg = li
        .select(col("flag"),
          HashFunctions.hash32(concat(lit("ok"), col("pk").cast("string"))).as("hv"))
        .select(col("flag"), pmod(col("hv"), lit(256L)).as("idx"),
          shiftright(col("hv"), 8).as("w"))
        .select(col("flag"), col("idx"),
          when(col("w") === 0, lit(25))
            .otherwise(lit(25) - length(bin(col("w")))).as("rho"))
        .groupBy("flag", "idx").agg(max(col("rho")).as("m"))
      def estCol(sCol: org.apache.spark.sql.Column,
                 nregCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        lit(alpha) * lit(65536e0) / (sCol + (lit(256L) - nregCol).cast("double"))
      val perFlag = reg.groupBy("flag").agg(
        count(lit(1)).as("nreg"),
        sum(lit(1.0) /
          call_function("shiftleft", lit(1L), col("m").cast("int")).cast("double")).as("s"))
        .select(col("flag"), estCol(col("s"), col("nreg")).as("est"))
      val flags = reg.select("flag").distinct()
      val pairs = broadcast(flags.as("x").join(flags.as("y"),
          col("x.flag") < col("y.flag"))
        .select(col("x.flag").as("fa"), col("y.flag").as("fb")))
      val uni = reg.join(pairs, col("flag") === col("fa") || col("flag") === col("fb"))
        .groupBy("fa", "fb", "idx").agg(max(col("m")).as("mu"))
        .groupBy("fa", "fb").agg(
          count(lit(1)).as("nreg"),
          sum(lit(1.0) /
            call_function("shiftleft", lit(1L), col("mu").cast("int")).cast("double")).as("s"))
        .select(col("fa"), col("fb"), estCol(col("s"), col("nreg")).as("est_union"))
      val fp = li.select("flag", "pk").distinct()
      val exact = fp.as("a").join(fp.as("b"),
          col("a.pk") === col("b.pk") && col("a.flag") < col("b.flag"))
        .groupBy(col("a.flag").as("fa"), col("b.flag").as("fb"))
        .agg(count(lit(1)).as("n_exact_inter"))
      uni
        .join(perFlag.select(col("flag").as("fa"), col("est").as("ea")), "fa")
        .join(perFlag.select(col("flag").as("fb"), col("est").as("eb")), "fb")
        .join(exact, Seq("fa", "fb"), "left_outer")
        .na.fill(0L, Seq("n_exact_inter"))
        .select(col("fa"), col("fb"), col("n_exact_inter"),
          Det.rdet(col("ea"), 2).as("est_a"),
          Det.rdet(col("eb"), 2).as("est_b"),
          Det.rdet(col("est_union"), 2).as("est_union"),
          Det.rdet(col("ea") + col("eb") - col("est_union"), 2).as("est_inter"))
        .orderBy("fa", "fb")
    },
    Some(s"""
      WITH li AS (SELECT l_returnflag AS flag, l_orderkey AS pk FROM lineitem),
      h AS (SELECT flag, pk, ${h32("('ok' || CAST(pk AS VARCHAR))")} AS hv FROM li),
      reg AS (SELECT flag, hv % 256 AS idx,
                     max(CASE WHEN hv // 256 = 0 THEN 25
                              ELSE 25 - length(bin(hv // 256)) END) AS m
              FROM h GROUP BY 1, 2),
      per AS (SELECT flag,
                     (0.7213e0 / (1e0 + 1.079e0 / 256e0)) * 65536e0 /
                       (SUM(1e0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE))
                         + CAST(256 - count(*) AS DOUBLE)) AS est
              FROM reg GROUP BY 1),
      fl AS (SELECT DISTINCT flag FROM reg),
      pairs AS (SELECT x.flag AS fa, y.flag AS fb FROM fl x, fl y
                WHERE x.flag < y.flag),
      uni0 AS (SELECT fa, fb, idx, max(m) AS mu
               FROM pairs JOIN reg ON flag = fa OR flag = fb
               GROUP BY 1, 2, 3),
      uni AS (SELECT fa, fb,
                     (0.7213e0 / (1e0 + 1.079e0 / 256e0)) * 65536e0 /
                       (SUM(1e0 / CAST(CAST(1 AS BIGINT) << mu AS DOUBLE))
                         + CAST(256 - count(*) AS DOUBLE)) AS est_union
              FROM uni0 GROUP BY 1, 2),
      fp AS (SELECT DISTINCT flag, pk FROM li),
      ex AS (SELECT a.flag AS fa, b.flag AS fb, CAST(count(*) AS BIGINT)
                      AS n_exact_inter
             FROM fp a JOIN fp b ON a.pk = b.pk AND a.flag < b.flag
             GROUP BY 1, 2)
      SELECT fa, fb, COALESCE(n_exact_inter, 0) AS n_exact_inter,
             floor(pa.est * 1e2 + 0.5) / 1e2 AS est_a,
             floor(pb.est * 1e2 + 0.5) / 1e2 AS est_b,
             floor(est_union * 1e2 + 0.5) / 1e2 AS est_union,
             floor((pa.est + pb.est - est_union) * 1e2 + 0.5) / 1e2 AS est_inter
      FROM uni JOIN per pa ON pa.flag = fa JOIN per pb ON pb.flag = fb
           LEFT JOIN ex USING (fa, fb)
      ORDER BY fa, fb"""))

  private val markersSql: Map[String, String] =
    graft.operators.TextAnalysis.LangMarkers.toMap.map { case (l, ms) =>
      l -> ms.map(m => s"'$m'").mkString("(", ", ", ")")
    }

  /** CLASSIFIER EVALUATION — confusion-matrix metrics for the q29
    * language-ID heuristic against the labeled `lang` column: per
    * predictable class, support, predicted count, true positives, and
    * precision/recall/F1 as ×10⁶-scaled BIGINTs, one row per class that
    * appears as a LABEL or a PREDICTION (full outer of the two margins,
    * so a class the model never emits still shows its zero row). The
    * numbers are honestly degenerate on this corpus: the synthetic langs
    * share one vocabulary, so every doc ties toward 'en' (precision =
    * en's base rate 0.436, recall 1.0, other classes all zero) — an eval
    * query exists exactly to expose that. Scale shape:
    * the classifier is a projection in the scan; the whole evaluation is
    * one (label, prediction) hash aggregate (≤ classes² rows) and three
    * tiny re-aggregations of it — model eval at 100 TB costs one pass.
    */
  val q169LangidEval: QueryDef = QueryDef(
    "q169_langid_eval",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pred = graft.operators.TextAnalysis.langId(docs)
        .select(col("doc_id"), col("pred_lang"))
      val conf = docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      val nTrue = conf.groupBy(col("lang").as("cls")).agg(sum("n").as("n_true"))
      val nPred = conf.groupBy(col("pred_lang").as("cls")).agg(sum("n").as("n_pred"))
      val tp = conf.filter(col("lang") === col("pred_lang"))
        .select(col("lang").as("cls"), col("n").as("tp"))
      val p = col("tp").cast("double") / col("n_pred").cast("double")
      val r = col("tp").cast("double") / col("n_true").cast("double")
      nTrue.join(nPred, Seq("cls"), "full_outer")
        .join(tp, Seq("cls"), "left_outer")
        .na.fill(0L, Seq("n_true", "n_pred", "tp"))
        .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
          Det.rdetLong(when(col("n_pred") === 0, lit(0.0)).otherwise(p), 6).as("prec_e6"),
          Det.rdetLong(when(col("n_true") === 0, lit(0.0)).otherwise(r), 6).as("rec_e6"),
          Det.rdetLong(when(col("tp") === 0, lit(0.0))
            .otherwise(lit(2.0) * p * r / (p + r)), 6).as("f1_e6"))
        .orderBy("cls")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, lang,
          ${graft.operators.TextAnalysis.LangMarkers.map { case (l, _) =>
            s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${markersSql(l)})) AS BIGINT) AS s_$l"
          }.mkString(",\n          ")}
        FROM documents),
      pred AS (SELECT doc_id, lang,
                 CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                      WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                      WHEN s_de >= s_es THEN 'de'
                      ELSE 'es' END AS pred_lang
               FROM scored),
      conf AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
               FROM pred GROUP BY 1, 2),
      nt AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS n_true FROM conf GROUP BY 1),
      np AS (SELECT pred_lang AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM conf GROUP BY 1),
      tp AS (SELECT lang AS cls, n AS tp FROM conf WHERE lang = pred_lang)
      SELECT COALESCE(nt.cls, np.cls) AS cls, COALESCE(n_true, 0) AS n_true,
             COALESCE(n_pred, 0) AS n_pred, COALESCE(tp, 0) AS tp,
             ${Det.rdetLongSql(
               """CASE WHEN COALESCE(n_pred, 0) = 0 THEN 0e0
                  ELSE CAST(COALESCE(tp, 0) AS DOUBLE) / n_pred END""", 6)} AS prec_e6,
             ${Det.rdetLongSql(
               """CASE WHEN COALESCE(n_true, 0) = 0 THEN 0e0
                  ELSE CAST(COALESCE(tp, 0) AS DOUBLE) / n_true END""", 6)} AS rec_e6,
             ${Det.rdetLongSql(
               """CASE WHEN COALESCE(tp, 0) = 0 THEN 0e0
                  ELSE 2e0 * (CAST(tp AS DOUBLE) / n_pred) * (CAST(tp AS DOUBLE) / n_true)
                       / ((CAST(tp AS DOUBLE) / n_pred) + (CAST(tp AS DOUBLE) / n_true)) END""", 6)}
               AS f1_e6
      FROM nt FULL OUTER JOIN np ON nt.cls = np.cls
           LEFT JOIN tp ON tp.cls = COALESCE(nt.cls, np.cls)
      ORDER BY cls"""))

  /** Distributed AUC via the RANK-SUM (Mann–Whitney U) identity — the
    * ranking-model eval metric at corpus scale, with EXACT integer tie
    * handling: AUC = U/(n_pos·n_neg) where U counts (pos, neg) pairs
    * ordered correctly, ties half. Per distinct score: (n_pos, n_neg)
    * from one hash aggregate; "negatives strictly below" decomposes into
    * a 65-row bucket cumulative (floor(score·64), non-foldable-constant
    * window key) plus a within-bucket window partitioned by bucket —
    * never an unpartitioned window over the score domain, never a pair
    * join over n_pos·n_neg rows. U is accumulated ×2 (U2 = Σ n_p·(2·below
    * + n_n)) so the tie half-credit stays integer; only the final
    * U2/(2·n_pos·n_neg) touches doubles. Label: n_chars ≥ 300, scored by
    * the q30 quality — whose length terms genuinely order long docs
    * first, so the metric's DIRECTION sensitivity is exercised (measured
    * AUC ≈ 0.993 at sf0.01; a sign error in `below` would crater it,
    * where an uninformative label's ≈0.5 would hide one).
    */
  val q170AucRanksum: QueryDef = QueryDef(
    "q170_auc_ranksum",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val q = graft.operators.TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("quality").as("s"))
        .join(docs.select(col("doc_id"),
          when(col("n_chars") >= 300, 1L).otherwise(0L).as("p")), "doc_id")
      val per = q.groupBy("s").agg(sum(col("p")).as("np"),
        sum(lit(1L) - col("p")).as("nn"))
      val bkt = per.withColumn("b", floor(col("s") * 64).cast("long"))
      val bucketNn = bkt.groupBy("b").agg(sum("nn").as("nn_b"))
      val wB = Window.partitionBy(col("b") * 0).orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val below_b = bucketNn.withColumn("nn_before_b",
        coalesce(sum(col("nn_b")).over(wB), lit(0L))).select("b", "nn_before_b")
      val wS = Window.partitionBy("b").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val scored = bkt
        .withColumn("nn_before_s", coalesce(sum(col("nn")).over(wS), lit(0L)))
        .join(below_b, "b")
        .select(col("np"), col("nn"),
          (col("nn_before_b") + col("nn_before_s")).as("below"))
      scored.agg(
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
          sum(col("np") * (lit(2L) * col("below") + col("nn"))).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          Det.rdetLong(col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc_e6"))
    },
    Some(s"""
      WITH w0 AS (SELECT doc_id, n_chars, text, string_split(text, ' ') AS w
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
                 FROM w0)),
      per AS (SELECT s,
                     CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS np,
                     CAST(SUM(CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END) AS BIGINT) AS nn
              FROM qual GROUP BY 1),
      c AS (SELECT np, nn,
                   CAST(COALESCE(SUM(nn) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS below
            FROM per)
      SELECT CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
             CAST(SUM(np * (2 * below + nn)) AS BIGINT) AS u2,
             ${Det.rdetLongSql(
               "CAST(SUM(np * (2 * below + nn)) AS DOUBLE) / (2e0 * SUM(np) * SUM(nn))", 6)}
               AS auc_e6
      FROM c"""))

  val all: Seq[QueryDef] = Seq(
    q162MarketShare, q163SourceOverlap, q164VocabGrowth, q165Containment,
    q166SplitLeakage, q167JoinSizeSketch, q168HllIntersect, q169LangidEval,
    q170AucRanksum)
}
