package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det
import graft.functions.Det.{dsum, dsumSql}

/** Second coverage batch: cube / grouping sets, exact percentiles, moment
  * statistics from exact sums, ordered collect aggregations, full-outer and
  * range joins, HLL approximate distinct, manual pivot, date arithmetic.
  */
object RelationalQueries2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** CUBE over (returnflag, linestatus) with grouping() sentinels. */
  val q39Cube: QueryDef = QueryDef(
    "q39_cube",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("rev"),
          grouping(col("l_returnflag")).as("g1"), grouping(col("l_linestatus")).as("g2"))
        .select(
          when(col("g1") === 1, "ALL").otherwise(col("l_returnflag")).as("returnflag"),
          when(col("g2") === 1, "ALL").otherwise(col("l_linestatus")).as("linestatus"),
          col("n"), col("rev"))
        .orderBy("returnflag", "linestatus"),
    Some(s"""
      SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
             CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
             count(*) AS n, ${dsumSql("l_extendedprice")} AS rev
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** Explicit GROUPING SETS (SQL surface — registered view + spark.sql). */
  val q40GroupingSets: QueryDef = QueryDef(
    "q40_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(s"""
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
               count(*) AS n,
               ${dsumSql("o_totalprice")} AS rev
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        ORDER BY status, priority""")
    },
    Some(s"""
      SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
             CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
             count(*) AS n, ${dsumSql("o_totalprice")} AS rev
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
      ORDER BY status, priority"""))

  /** Exact interpolated percentiles (median, p90) per group — computed by
    * [[graft.operators.Ranks.interpolatedPercentiles]] (distributed
    * selection: neighbor-rank picks + IEEE interpolation) rather than the
    * `percentile()` ObjectHashAggregate, which buffers a group's ENTIRE
    * value column inside one final reducer and was the one registered plan
    * that would not survive 100× (rounds 4–6 `weak`). RanksSpec pins the
    * two forms equal; PlanSpec bans the single-reducer aggregate from the
    * whole surface.
    */
  val q41Percentile: QueryDef = QueryDef(
    "q41_percentile",
    (s, dir) => {
      // cache: the count + four rank selections (lo/hi × p50/p90) all
      // re-read this pruned 4-column relation
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .transform(graft.operators.ScopedCache.cache)
      graft.operators.Ranks.interpolatedPercentiles(li, Seq("l_returnflag"),
        col("l_extendedprice"), Seq(col("l_orderkey"), col("l_linenumber")),
        Seq(0.5 -> "p50", 0.9 -> "p90"))
        .select(col("l_returnflag"),
          Det.rdet(col("p50"), 4).as("p50"), Det.rdet(col("p90"), 4).as("p90"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
             ${Det.rdetSql("quantile_cont(l_extendedprice, 0.5e0)", 4)} AS p50,
             ${Det.rdetSql("quantile_cont(l_extendedprice, 0.9e0)", 4)} AS p90
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Sample stddev and correlation computed from exact decimal moment sums —
    * order-independent where the built-in streaming moments are not.
    */
  val q42Stats: QueryDef = QueryDef(
    "q42_stats",
    (s, dir) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(x).as("sx"), dsum(x * x).as("sxx"),
          dsum(y).as("sy"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
        .select(
          col("l_returnflag"),
          Det.rdet(sqrt((col("n") * col("syy") - col("sy") * col("sy")) /
            (col("n") * (col("n") - 1))), 4).as("std_price"),
          Det.rdet((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
             ${Det.rdetSql("sqrt((n * syy - sy * sy) / (n * (n - 1)))", 4)} AS std_price,
             ${Det.rdetSql(
               "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 6)}
               AS corr_qty_price
      FROM (
        SELECT l_returnflag, count(*) AS n,
               ${dsumSql("l_quantity")} AS sx, ${dsumSql("l_quantity * l_quantity")} AS sxx,
               ${dsumSql("l_extendedprice")} AS sy,
               ${dsumSql("l_extendedprice * l_extendedprice")} AS syy,
               ${dsumSql("l_quantity * l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag"""))

  /** Ordered collect aggregations: sorted distinct collect_set rendered as a
    * joined string (scalar output — the driver's comparator cannot sort
    * list-typed columns, so the array itself never leaves the query).
    */
  val q43CollectSorted: QueryDef = QueryDef(
    "q43_collect_sorted",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("prio_csv"),
          size(collect_set(col("o_orderpriority"))).as("n_distinct"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus,
             array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prio_csv,
             CAST(count(DISTINCT o_orderpriority) AS INTEGER) AS n_distinct,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Full outer join of two yearly aggregates with deliberately asymmetric
    * ranges (nulls on both sides; the join key is coalesced so ordering
    * stays engine-independent).
    */
  val q44FullOuter: QueryDef = QueryDef(
    "q44_full_outer",
    (s, dir) => {
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) < 1999)
        .groupBy(year(col("o_orderdate")).as("o_yr")).agg(count(lit(1)).as("n_orders"))
      val l = t(s, dir, "lineitem").filter(year(col("l_shipdate")) > 1997)
        .groupBy(year(col("l_shipdate")).as("l_yr")).agg(count(lit(1)).as("n_items"))
      o.join(l, col("o_yr") === col("l_yr"), "full_outer")
        .select(coalesce(col("o_yr"), col("l_yr")).as("yr"),
          col("n_orders"), col("n_items"))
        .orderBy("yr")
    },
    Some("""
      SELECT coalesce(o_yr, l_yr) AS yr, n_orders, n_items FROM
        (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_yr, count(*) AS n_orders
         FROM orders WHERE year(o_orderdate) < 1999 GROUP BY 1) o
      FULL OUTER JOIN
        (SELECT CAST(year(l_shipdate) AS INTEGER) AS l_yr, count(*) AS n_items
         FROM lineitem WHERE year(l_shipdate) > 1997 GROUP BY 1) l
      ON o_yr = l_yr
      ORDER BY yr"""))

  /** Time-range self-join: per user, event pairs within 60 seconds — an
    * equi-join on user_id with the range predicate as a post-filter (per-user
    * groups are small; at scale, bucket time like the geo/length blocks).
    */
  val q45RangeJoin: QueryDef = QueryDef(
    "q45_range_join",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
      e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_id") < col("b.event_id") &&
            abs(col("a.us") - col("b.us")) <= 60000000L)
        .groupBy(col("a.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
      SELECT a.user_id AS user_id, count(*) AS n_pairs
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
       AND abs(a.us - b.us) <= 60000000
      GROUP BY 1 ORDER BY 1"""))

  /** HLL approximate distinct. The sketch estimate is engine-specific, so the
    * hashed output carries the exact count plus a boolean asserting the HLL
    * estimate landed within its error bound (default rsd 0.05; 15% = 3
    * sigma) — the oracle asserts the same bound trivially holds, which turns
    * "the sketch ran and was sane" into a hash-checkable fact.
    */
  val q46ApproxDistinct: QueryDef = QueryDef(
    "q46_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("approx_ok"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, true AS approx_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Manual pivot: one column per order status via conditional aggregation
    * (deterministic column set, unlike engine-native PIVOT).
    */
  val q47Pivot: QueryDef = QueryDef(
    "q47_pivot",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0d)).as("rev_f"),
          dsum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0d)).as("rev_o"),
          dsum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0d)).as("rev_p"))
        .orderBy("yr"),
    Some(s"""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0e0 END")} AS rev_f,
             ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0e0 END")} AS rev_o,
             ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0e0 END")} AS rev_p
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Date arithmetic: datediff to a fixed horizon, +30 days, month end. */
  val q48DateArith: QueryDef = QueryDef(
    "q48_date_arith",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_horizon"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_horizon,
             CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
             last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders ORDER BY o_orderkey"""))

  /** Correlated scalar subquery (decorrelated by Catalyst into an aggregate
    * + join): customers above their own nation's average balance. The
    * average is an exact decimal sum / count so the comparison threshold is
    * bit-identical across engines.
    */
  val q51CorrelatedSubquery: QueryDef = QueryDef(
    "q51_correlated_subquery",
    (s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(s"""
        SELECT c_custkey, c_name FROM customer c
        WHERE c_acctbal > (
          SELECT ${dsumSql("c2.c_acctbal")} / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    },
    Some(s"""
      SELECT c_custkey, c_name FROM customer c
      WHERE c_acctbal > (
        SELECT ${dsumSql("c2.c_acctbal")} / COUNT(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey"""))

  /** Generator (UDTF-class) surface: explode tokens, aggregate frequencies,
    * deterministic top-20.
    */
  val q52TokenExplode: QueryDef = QueryDef(
    "q52_token_explode",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20),
    Some("""
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token ORDER BY n DESC, token LIMIT 20"""))

  /** Window frames: first/last/nth value over an explicit ROWS frame plus
    * ntile bucketing, per user in event-time order.
    */
  val q53WindowFrames: QueryDef = QueryDef(
    "q53_window_frames",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("first_v", first("value").over(frame))
        .withColumn("last_v", last("value").over(frame))
        .withColumn("third_v", nth_value(col("value"), 3).over(frame))
        .withColumn("quartile", ntile(4).over(w))
        .select("user_id", "event_id", "first_v", "last_v", "third_v", "quartile")
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id,
             first_value(value) OVER wf AS first_v,
             last_value(value) OVER wf AS last_v,
             nth_value(value, 3) OVER wf AS third_v,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id, event_id"""))

  /** GROUP BY + HAVING over the aggregate. */
  val q59GroupHaving: QueryDef = QueryDef(
    "q59_group_having",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
        .filter(col("n") > 20)
        .orderBy("o_custkey"),
    Some(s"""
      SELECT o_custkey, count(*) AS n, ${dsumSql("o_totalprice")} AS rev
      FROM orders GROUP BY o_custkey HAVING count(*) > 20
      ORDER BY o_custkey"""))

  /** IN-subquery (plans as a left-semi join). */
  val q60InSubquery: QueryDef = QueryDef(
    "q60_in_subquery",
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      Tables.load(s, dir, "part").createOrReplaceTempView("part")
      s.sql(s"""
        SELECT l_returnflag, count(*) AS n,
               ${dsumSql("l_extendedprice")} AS rev
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some(s"""
      SELECT l_returnflag, count(*) AS n, ${dsumSql("l_extendedprice")} AS rev
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H Q17-style correlated aggregate: small-quantity lineitems relative
    * to their part's average (threshold from exact decimal sums).
    */
  val q61SmallQuantity: QueryDef = QueryDef(
    "q61_small_quantity",
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(s"""
        SELECT count(*) AS n, ${dsumSql("l_extendedprice")} AS rev
        FROM lineitem l1
        WHERE l_quantity < 0.5e0 * (
          SELECT ${dsumSql("l2.l_quantity")} / COUNT(*)
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""")
    },
    Some(s"""
      SELECT count(*) AS n, ${dsumSql("l_extendedprice")} AS rev
      FROM lineitem l1
      WHERE l_quantity < 0.5e0 * (
        SELECT ${dsumSql("l2.l_quantity")} / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""))

  /** Array/collection functions over the token array: element access,
    * membership, position, flatten/slice shapes — scalar outputs so both
    * engines compare exactly.
    */
  val q65ArrayFuncs: QueryDef = QueryDef(
    "q65_array_funcs",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(
          col("doc_id"),
          element_at(col("ts"), 1).as("first_tok"),
          element_at(col("ts"), -1).as("last_tok"),
          array_contains(col("ts"), "spark").as("has_spark"),
          array_position(col("ts"), "the").as("pos_the"),
          size(array_distinct(col("ts"))).as("n_distinct"),
          concat_ws("-", slice(col("ts"), 1, 3)).as("head3"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             ts[1] AS first_tok,
             ts[-1] AS last_tok,
             list_contains(ts, 'spark') AS has_spark,
             CAST(coalesce(list_position(ts, 'the'), 0) AS BIGINT) AS pos_the,
             CAST(len(list_distinct(ts)) AS INTEGER) AS n_distinct,
             array_to_string(list_slice(ts, 1, 3), '-') AS head3
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
      ORDER BY doc_id"""))

  /** from_json into a typed struct + field access (vs q17's string-path
    * extraction) — the schema-declared JSON route.
    */
  val q66FromJson: QueryDef = QueryDef(
    "q66_from_json",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .filter(col("k") > 90)
        .orderBy("event_id"),
    Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
      ORDER BY event_id"""))

  val all: Seq[QueryDef] = Seq(
    q39Cube, q40GroupingSets, q41Percentile, q42Stats, q43CollectSorted,
    q44FullOuter, q45RangeJoin, q46ApproxDistinct, q47Pivot, q48DateArith,
    q51CorrelatedSubquery, q52TokenExplode, q53WindowFrames,
    q59GroupHaving, q60InSubquery, q61SmallQuantity, q65ArrayFuncs, q66FromJson)
}
