package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Det, HashFunctions}

/** Round-5 surface, fifth tranche: frequent itemsets, path analytics, and
  * integrity checksums.
  */
object Round5Queries5 {

  /** Frequent pair mining — the first A-Priori join of market-basket
    * analysis over (order, part-bucket) baskets: items below the support
    * threshold are pruned BEFORE the pair join (monotonicity: no pair of
    * an infrequent item can be frequent), which is the step that makes
    * candidate generation tractable at scale — the pair explosion runs
    * over frequent items only, then one hash aggregate counts support.
    * Pairs form per order with i < j (each unordered pair once). Emits
    * pairs with support ≥ minsup plus their lift numerator/denominator
    * counts, the association-rule inputs.
    */
  val q144FrequentPairs: QueryDef = QueryDef(
    "q144_frequent_pairs",
    (s, dir) => {
      // item = floor(sqrt(partkey mod 2500)) gives a TRIANGULAR frequency
      // distribution (item k ~ 2k+1 parts), so support thresholds — stated
      // as FRACTIONS of the basket count, which keeps them scale-factor-
      // invariant — genuinely prune (uniform items would make every
      // threshold all-or-nothing)
      val baskets = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"),
          floor(sqrt(col("l_partkey") % 2500)).cast("long").as("item"))
        .distinct()
        .transform(graft.operators.ScopedCache.cache) // feeds item supports and the pair join
      val nOrders = broadcast(baskets.agg(countDistinct(col("ok")).as("n")))
      val freq = baskets.groupBy("item").agg(count(lit(1)).as("sup"))
        .crossJoin(nOrders)
        .filter(col("sup") >= lit(0.02e0) * col("n"))
        .select(col("item"), col("sup"))
      // Pair support via the WHOLE-STAGE-CODEGEN'D self-equi-join on the
      // basket key with partial aggregation — the q195 form, measured
      // faster there than the collect_list + nested-transform pair
      // explosion this query carried until r16: higher-order-function
      // lambdas evaluate INTERPRETED, so the per-basket array
      // comprehension paid a lambda walk per basket on top of the
      // groupBy(ok) shuffle it needed to build the arrays. The join form
      // runs the same A-Priori-pruned candidate volume entirely inside
      // codegen; both sides reuse one shuffle of fb by ok (same exchange
      // key). The skew bound is unchanged — per-basket work is capped by
      // the support threshold (#frequent items <= avgBasketSize/minsup),
      // and AQE can split a hot ok partition of the equi-join besides.
      val fb = graft.operators.ScopedCache.cache(baskets.join(freq, "item"))
      baskets.count() // all registrations done — safe to materialize (q195)
      val pairs = fb.select(col("ok"), col("item").as("i"), col("sup").as("si"))
        .join(fb.select(col("ok"), col("item").as("j"), col("sup").as("sj")),
          "ok")
        .filter(col("i") < col("j"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("sup_pair"),
          min(col("si")).as("sup_i"), min(col("sj")).as("sup_j"))
        .crossJoin(nOrders)
        .filter(col("sup_pair") >= lit(0.0075e0) * col("n"))
      pairs.select(col("i"), col("j"), col("sup_pair"), col("sup_i"), col("sup_j"))
        .orderBy("i", "j")
    },
    Some("""
      WITH baskets AS (SELECT DISTINCT l_orderkey AS ok,
                              CAST(floor(sqrt(l_partkey % 2500)) AS BIGINT) AS item
                       FROM lineitem),
      no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM baskets),
      freq AS (SELECT item, CAST(count(*) AS BIGINT) AS sup FROM baskets
               GROUP BY 1),
      fitems AS (SELECT item, sup FROM freq CROSS JOIN no
                 WHERE sup >= 0.02e0 * n),
      fb AS (SELECT ok, baskets.item, sup FROM baskets JOIN fitems USING (item)),
      pairs AS (SELECT a.item AS i, b.item AS j,
                       CAST(count(*) AS BIGINT) AS sup_pair,
                       min(a.sup) AS sup_i, min(b.sup) AS sup_j
                FROM fb a JOIN fb b ON a.ok = b.ok AND a.item < b.item
                GROUP BY 1, 2),
      fp AS (SELECT i, j, sup_pair, sup_i, sup_j FROM pairs CROSS JOIN no
             WHERE sup_pair >= 0.0075e0 * n)
      SELECT i, j, sup_pair, sup_i, sup_j FROM fp ORDER BY i, j"""))

  /** Session path analysis — the "user journey" operator: each user's
    * event-type sequence (ts-ordered, capped at the first 8 events — the
    * cap bounds state exactly like a sequence-packing window) concatenates
    * into a path string; paths aggregate to the top journeys. One window
    * pass (partitioned by user) + one hash aggregate; the path alphabet
    * is tiny so the aggregate is map-side-combinable. q107's transition
    * matrix is the 1st-order projection of this table.
    */
  val q145SessionPaths: QueryDef = QueryDef(
    "q145_session_paths",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val paths = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 8)
        .groupBy("user_id")
        .agg(concat_ws(">", array_sort(collect_list(
          struct(col("rn"), col("event_type")))).getField("event_type"))
          .as("path"))
      paths.groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(10)
    },
    Some("""
      WITH ranked AS (SELECT user_id, event_type,
                             row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
                      FROM events),
      paths AS (SELECT user_id,
                       string_agg(event_type, '>' ORDER BY rn) AS path
                FROM ranked WHERE rn <= 8 GROUP BY user_id)
      SELECT path, CAST(count(*) AS BIGINT) AS n_users
      FROM paths GROUP BY path ORDER BY n_users DESC, path LIMIT 10"""))

  /** Order-independent table checksum — the anti-entropy primitive for
    * verifying replicas / migrations without sorting anything: each row
    * hashes to a 32-bit value (md5 over the concatenated business key and
    * payload columns with a field separator), and the table fingerprint is
    * (row count, SUM of row hashes, XOR-free modular form) — addition is
    * commutative, so the checksum is identical under ANY partitioning,
    * ordering, or engine, and two 100 TB replicas compare by exchanging
    * 16 bytes. Computed per nation over customers so the output is a
    * per-shard checksum table (the shape a table-repair protocol diffs).
    */
  val q146TableChecksum: QueryDef = QueryDef(
    "q146_table_checksum",
    (s, dir) => {
      val rowHash = HashFunctions.hash32(concat_ws("|",
        col("c_custkey").cast("string"), col("c_name"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").cast("string")))
      Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("nation"), rowHash.as("h"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
        .orderBy("nation")
    },
    Some("""
      SELECT c_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(('0x' || substr(md5(
               CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
               c_mktsegment || '|' ||
               CAST(CAST(floor(c_acctbal * 100 + 0.5e0) AS BIGINT) AS VARCHAR)
             ), 1, 8))::BIGINT) AS BIGINT) AS checksum
      FROM customer GROUP BY 1 ORDER BY nation"""))

  /** SCD2 point-in-time lookup — the query side of q96's dimension
    * maintenance (the "time travel" join a warehouse runs constantly):
    * every order joins the customer-segment VERSION valid at its order
    * date, via an equi-join on the business key plus a per-row validity
    * predicate over half-open [valid_from, valid_to) intervals. At scale
    * this is an equi-join whose per-key fan-in is the (small, bounded)
    * version count — never an interval cross product. Revenue then
    * aggregates by the period-correct segment: 1998 orders of upgraded
    * customers land in 'UPGRADED', their older orders stay in the
    * historical segment — the figure an as-of-naive join (current segment
    * for all history) silently gets wrong.
    */
  val q147Scd2Lookup: QueryDef = QueryDef(
    "q147_scd2_lookup",
    (s, dir) => {
      // the q96 SCD2 derivation (kept textually tiny; see q96 for the
      // maintenance semantics)
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val upd = Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")) >= 1998)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("eff"))
      val joined = dim.join(upd, Seq("c_custkey"), "left")
      val scd = joined.select(col("c_custkey"),
          col("c_mktsegment").as("segment"),
          lit("1990-01-01").cast("date").as("valid_from"),
          col("eff").as("valid_to"))
        .unionByName(joined.filter(col("eff").isNotNull)
          .select(col("c_custkey"), lit("UPGRADED").as("segment"),
            col("eff").as("valid_from"), lit(null).cast("date").as("valid_to")))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"),
          col("o_orderdate").cast("date").as("od"), col("o_totalprice"))
      o.join(scd, Seq("c_custkey"))
        .filter(col("od") >= col("valid_from") &&
          (col("valid_to").isNull || col("od") < col("valid_to")))
        .groupBy(col("segment"), year(col("od")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("segment", "yr")
    },
    Some(s"""
      WITH upd AS (SELECT o_custkey AS c_custkey,
                          CAST(max(o_orderdate) AS DATE) AS eff
                   FROM orders WHERE year(o_orderdate) >= 1998 GROUP BY 1),
      j AS (SELECT c.c_custkey, c.c_mktsegment, upd.eff
            FROM customer c LEFT JOIN upd USING (c_custkey)),
      scd AS (
        SELECT c_custkey, c_mktsegment AS segment,
               DATE '1990-01-01' AS valid_from, eff AS valid_to FROM j
        UNION ALL
        SELECT c_custkey, 'UPGRADED', eff, NULL FROM j WHERE eff IS NOT NULL),
      o AS (SELECT o_custkey AS c_custkey, CAST(o_orderdate AS DATE) AS od,
                   o_totalprice FROM orders)
      SELECT segment, CAST(year(od) AS BIGINT) AS yr,
             CAST(count(*) AS BIGINT) AS n_orders,
             ${Det.dsumSql("o_totalprice")} AS revenue
      FROM o JOIN scd USING (c_custkey)
      WHERE od >= valid_from AND (valid_to IS NULL OR od < valid_to)
      GROUP BY 1, 2 ORDER BY segment, yr"""))

  val all: Seq[QueryDef] =
    Seq(q144FrequentPairs, q145SessionPaths, q146TableChecksum, q147Scd2Lookup)
}
