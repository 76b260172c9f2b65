package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Det
import graft.functions.Det.{dsum, dsumSql}
import graft.functions.{HashFunctions, Layout}
import graft.operators.{AsofJoin, KMeans}

/** Round-2 surface batch: as-of join, unpivot/melt, deterministic hash
  * sampling (whole-table and stratified), rolling event-time range frames,
  * a trained k-means coarse quantizer, and MapType plumbing.
  */
object ExtQueries {

  /** DuckDB fragment: portable hash32 (first 8 md5 hex chars as bigint). */
  private def h32(x: String): String = s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  /** As-of (point-in-time) join: each click is annotated with the user's
    * latest purchase at or before the click. Spark side is the union+window
    * formulation (graft.operators.AsofJoin — no join node, one shuffle);
    * the oracle is DuckDB's native ASOF LEFT JOIN, an independent algorithm
    * that must agree row-for-row.
    */
  val q67AsofJoin: QueryDef = QueryDef(
    "q67_asof_join",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      // unique (user_id, ts) build rows: max event_id wins a tied timestamp
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_event"))
        .withColumn("p_ts_us", expr("unix_micros(ts)"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofJoin.backward(clicks, purchases, "user_id", "ts", Seq("p_event", "p_ts_us"))
        .select(col("event_id"), col("p_event"), col("p_ts_us"),
          (expr("unix_micros(ts)") - col("p_ts_us")).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH p AS (SELECT user_id, ts, max(event_id) AS p_event
                 FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT c.event_id AS event_id, p.p_event AS p_event,
             epoch_us(p.ts) AS p_ts_us,
             epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY event_id"""))

  /** Unpivot/melt: the q47-style manual pivot folded back into rows with
    * Spark's native unpivot against DuckDB's UNPIVOT.
    */
  val q68Unpivot: QueryDef = QueryDef(
    "q68_unpivot",
    (s, dir) => {
      val pv = Tables.load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0d)).as("rev_f"),
          dsum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0d)).as("rev_o"),
          dsum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0d)).as("rev_p"))
      pv.unpivot(Array(col("yr")), Array(col("rev_f"), col("rev_o"), col("rev_p")),
          "status", "rev")
        .orderBy("yr", "status")
    },
    Some(s"""
      SELECT yr, status, rev FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0e0 END")} AS rev_f,
               ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0e0 END")} AS rev_o,
               ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0e0 END")} AS rev_p
        FROM orders GROUP BY 1
      ) UNPIVOT (rev FOR status IN (rev_f, rev_o, rev_p))
      ORDER BY yr, status"""))

  /** Deterministic 5% hash sample: md5-derived hash32 mod 20 — portable
    * across engines AND across cluster sizes/partitionings, unlike
    * TABLESAMPLE or rand(seed). The shape every 100 TB pipeline uses to
    * carve reproducible dev subsets.
    */
  val q69HashSample: QueryDef = QueryDef(
    "q69_hash_sample",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(pmod(HashFunctions.hash32(col("o_orderkey").cast("string")), lit(20L)) === 0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
        .orderBy("o_orderstatus"),
    Some(s"""
      SELECT o_orderstatus, count(*) AS n, ${dsumSql("o_totalprice")} AS rev
      FROM orders
      WHERE ${h32("CAST(o_orderkey AS VARCHAR)")} % 20 = 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Trained coarse quantizer: deterministic Lloyd's k-means (k=4, 2
    * iterations) over the 64-dim embeddings, oracle-checked end to end —
    * init, both assignment rounds, both centroid updates, and the final
    * assignment all reproduce bit-for-bit in DuckDB (see
    * graft.operators.KMeans for the determinism contract).
    */
  val q70KmeansIvf: QueryDef = QueryDef(
    "q70_kmeans_ivf",
    (s, dir) => KMeans.fit(Tables.load(s, dir, "embeddings"), k = 4, iters = 2)
      .orderBy("vec_id"),
    Some(kmeansOracle(k = 4, iters = 2, dim = 64)))

  /** Rolling 1-hour event-time window per user: RANGE frame over epoch
    * micros, count plus an exact-decimal rolling sum.
    */
  val q71RollingWindow: QueryDef = QueryDef(
    "q71_rolling_window",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("us"), col("value"))
        .withColumn("n_1h",
          count(lit(1)).over(Window.partitionBy("user_id").orderBy(col("us"))
            .rangeBetween(-3600000000L, 0)))
        .withColumn("rev_1h",
          floor(sum(col("value").cast(DecimalType(30, 8)))
            .over(Window.partitionBy("user_id").orderBy(col("us"))
              .rangeBetween(-3600000000L, 0)) * 100).cast("long") / 100.0d)
        .select("event_id", "n_1h", "rev_1h")
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             count(*) OVER w AS n_1h,
             CAST(floor(SUM(CAST(value AS DECIMAL(30,8))) OVER w * 100) AS BIGINT) / 100.0e0 AS rev_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Stratified deterministic sample: lowest-hash 20% of customers within
    * each market segment (hash-ranked, not rand()) — proportional per
    * stratum and reproducible anywhere.
    */
  val q72StratifiedSample: QueryDef = QueryDef(
    "q72_stratified_sample",
    (s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("h", HashFunctions.hash32(col("c_custkey").cast("string")))
        .withColumn("rn", row_number().over(w.orderBy(col("h"), col("c_custkey"))))
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("rn") <= (col("cnt") / 5).cast("long"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_sampled"), dsum(col("c_acctbal")).as("bal"))
        .orderBy("c_mktsegment")
    },
    Some(s"""
      WITH h AS (SELECT c_mktsegment, c_custkey, c_acctbal,
                        ${h32("CAST(c_custkey AS VARCHAR)")} AS h FROM customer),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY c_mktsegment ORDER BY h, c_custkey) AS rn,
              count(*) OVER (PARTITION BY c_mktsegment) AS cnt
            FROM h)
      SELECT c_mktsegment, count(*) AS n_sampled, ${dsumSql("c_acctbal")} AS bal
      FROM r WHERE rn <= cnt // 5
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** MapType end to end: props parsed as map<string,int>, extended with a
    * derived entry via map_concat, then read back out as scalars.
    *
    * Contract (guarded, not assumed): rows participate only when the parsed
    * map exists, has key 'k', and does NOT already have key 'kk' — so
    * map_concat can never hit a duplicate key under the default
    * spark.sql.mapKeyDedupPolicy=EXCEPTION, whatever the data holds. n_keys
    * and keys_csv are computed from the actual key set on both sides, not
    * hardcoded to the fixture's {"k": int} shape. Map VALUES must be
    * int-coercible or from_json nulls the whole map — the oracle applies the
    * same value-shape guard (every key's json_type integer-typed and in int32
    * range), so both sides drop such rows on arbitrary data, not just on the
    * fixture. (Residual: oracle path building assumes keys without '.'.)
    */
  val q73MapFuncs: QueryDef = QueryDef(
    "q73_map_funcs",
    (s, dir) => {
      val m0 = from_json(col("props"), lit("map<string,int>"))
      Tables.load(s, dir, "events")
        .withColumn("m0", m0)
        .filter(col("m0").isNotNull &&
          map_contains_key(col("m0"), lit("k")) &&
          !map_contains_key(col("m0"), lit("kk")))
        .withColumn("m",
          map_concat(col("m0"), map(lit("kk"), element_at(col("m0"), "k") * 2)))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          element_at(col("m"), "kk").as("kk_val"),
          size(col("m")).as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
             CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS kk_val,
             CAST(len(json_keys(props)) + 1 AS INTEGER) AS n_keys,
             array_to_string(list_sort(list_append(json_keys(props), 'kk')), ',') AS keys_csv
      FROM events
      WHERE props IS NOT NULL
        AND list_contains(json_keys(props), 'k')
        AND NOT list_contains(json_keys(props), 'kk')
        AND len(list_filter(json_keys(props), key ->
              json_type(props, '$.' || key) NOT IN ('BIGINT', 'UBIGINT')
              OR CAST(json_extract_string(props, '$.' || key) AS BIGINT)
                   NOT BETWEEN -2147483648 AND 2147483647)) = 0
      ORDER BY event_id"""))

  /** DuckDB squared-L2 via the dot-product identity — same sequential
    * double folds as the Spark-side VectorDotProduct expressions.
    */
  private[queries] def d2Sql(e: String, c: String, dim: Int): String = {
    def dot(a: String, b: String): String =
      s"""list_reduce(list_transform(generate_series(1, $dim),
         |  i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin.replace("\n", " ")
    s"(${dot(e, e)} - 2.0e0 * ${dot(e, c)} + ${dot(c, c)})"
  }

  /** The unrolled Lloyd-iteration CTE chain mirroring [[KMeans.fit]]:
    * e, c0 (init), a1, c1, ..., a$iters, c$iters, and `af` = the final
    * assignment (vec_id, cluster, embedding, d2). Every fold is the same
    * sequential double list_reduce the Spark expressions use.
    *
    * `eBody` overrides the corpus CTE — the default trains on the raw
    * embeddings table; q348 passes a DERIVED corpus (256 base vectors x 16
    * exact power-of-two-scaled copies) so the chain can be unrolled at the
    * k semanticDedup derives past the 2048-row fixture bound.
    */
  private[queries] def kmeansCtes(k: Int, iters: Int, dim: Int,
      eBody: String = "SELECT vec_id, embedding FROM embeddings"): String = {
    def assignCte(cents: String, out: String): String =
      s"""$out AS (SELECT vec_id, cluster, embedding, d2 FROM (
         |  SELECT e.vec_id, $cents.cluster, e.embedding,
         |         ${d2Sql("e.embedding", s"$cents.centroid", dim)} AS d2,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${d2Sql("e.embedding", s"$cents.centroid", dim)}, $cents.cluster) AS rk
         |  FROM e, $cents) WHERE rk = 1)""".stripMargin.replace("\n", " ")
    def updateCtes(assigned: String, mOut: String, cOut: String): String =
      s"""$mOut AS (SELECT cluster, i,
         |    CAST(SUM(CAST(floor(embedding[i]::DOUBLE * 1000000.0e0 + 0.5e0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0e0 / count(*) AS mean
         |  FROM $assigned, generate_series(1, $dim) g(i) GROUP BY cluster, i),
         |$cOut AS (SELECT cluster, list(mean ORDER BY i) AS centroid FROM $mOut GROUP BY cluster)"""
        .stripMargin.replace("\n", " ")
    val rounds = (1 to iters).map { r =>
      s"${assignCte(s"c${r - 1}", s"a$r")}, ${updateCtes(s"a$r", s"m$r", s"c$r")}"
    }.mkString(",\n      ")
    s"""e AS ($eBody),
      c0 AS (SELECT vec_id AS cluster,
                    list_transform(embedding, x -> x::DOUBLE) AS centroid
             FROM e WHERE vec_id < $k),
      $rounds,
      ${assignCte(s"c$iters", "af")}"""
  }

  private def kmeansOracle(k: Int, iters: Int, dim: Int): String =
    s"""
      WITH ${kmeansCtes(k, iters, dim)}
      SELECT vec_id, cluster, ${Det.rdetSql("d2", 6)} AS d2
      FROM af ORDER BY vec_id"""

  /** IVF search end to end: the q70-trained centroids index the corpus, and
    * each query probes only its own cluster's members for the top-5 nearest
    * by squared L2 — train, index, and search all oracle-checked as one
    * query. The probe touches |corpus|/k candidates instead of the corpus
    * (single-probe IVF; multi-probe = relax the cluster equality to the
    * best p clusters).
    */
  val q74IvfSearch: QueryDef = QueryDef(
    "q74_ivf_search",
    (s, dir) => {
      import graft.plans.VectorDotProduct
      val emb = Tables.load(s, dir, "embeddings")
      val assigned = KMeans.fit(emb, k = 4, iters = 2)
        .select("vec_id", "cluster")
        .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .transform(graft.operators.ScopedCache.cache)
      val queries = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("cluster"), col("embedding").as("q_emb"))
      val d2 = VectorDotProduct(col("embedding"), col("embedding")) -
        lit(2.0d) * VectorDotProduct(col("embedding"), col("q_emb")) +
        VectorDotProduct(col("q_emb"), col("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("d2"), col("vec_id"))
      assigned.join(broadcast(queries), Seq("cluster"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("d2", Det.rdet(d2, 6))
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 5)
        .select("q_id", "rk", "vec_id", "d2")
        .orderBy("q_id", "rk")
    },
    Some(s"""
      WITH ${kmeansCtes(4, 2, 64)},
      q AS (SELECT vec_id AS q_id, cluster, embedding AS q_emb FROM af WHERE vec_id < 10),
      sc AS (SELECT q_id, a.vec_id AS vec_id,
                    ${Det.rdetSql(d2Sql("a.embedding", "q_emb", 64), 6)} AS d2
             FROM af a JOIN q USING (cluster) WHERE a.vec_id <> q_id)
      SELECT q_id, rk, vec_id, d2 FROM (
        SELECT q_id, vec_id, d2,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS INTEGER) AS rk
        FROM sc)
      WHERE rk <= 5 ORDER BY q_id, rk"""))

  /** Video-style frame sampling over the opaque binary payload: every
    * 16th byte is a "frame"; the count and the head digest are pure
    * integer facts both engines can derive (the corpus is ASCII, so DuckDB
    * can address bytes as characters).
    */
  val q75FrameSample: QueryDef = QueryDef(
    "q75_frame_sample",
    (s, dir) => {
      val media = graft.operators.Multimodal.attachPayload(Tables.load(s, dir, "documents"))
      graft.operators.Multimodal.frameSample(media, stride = 16)
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST((octet_length(encode(text)) + 15) // 16 AS INTEGER) AS n_frames,
             CAST(list_aggregate(list_transform(
               generate_series(1, least(8, (octet_length(encode(text)) + 15) // 16)),
               f -> ascii(substr(text, (f - 1) * 16 + 1, 1))), 'sum') AS INTEGER) AS head_digest
      FROM documents ORDER BY doc_id"""))

  /** Z-order layout key over (partkey, suppkey) low bytes, aggregated per
    * curve segment: each 1024-key segment's min/max span in BOTH dimensions
    * stays bounded — the property that makes a zkey-sorted parquet write
    * prunable on either column. (StorageLayoutSpec verifies the pruning
    * itself; this query pins the key arithmetic cross-engine.)
    */
  val q76ZorderKey: QueryDef = QueryDef(
    "q76_zorder_key",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .select(pmod(col("l_partkey"), lit(256L)).cast("int").as("x"),
          pmod(col("l_suppkey"), lit(256L)).cast("int").as("y"))
        .withColumn("seg", (Layout.zorder16(col("x"), col("y")) / 1024L).cast("long"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy("seg")
    },
    Some(s"""
      WITH xy AS (SELECT CAST(l_partkey % 256 AS INTEGER) AS x,
                         CAST(l_suppkey % 256 AS INTEGER) AS y
                  FROM lineitem),
      z AS (SELECT x, y, ${Layout.zorder16Sql("x", "y")} // 1024 AS seg FROM xy)
      SELECT seg, count(*) AS n,
             min(x) AS x_min, max(x) AS x_max,
             min(y) AS y_min, max(y) AS y_max
      FROM z GROUP BY seg ORDER BY seg"""))

  /** Multi-probe IVF: each query probes its TWO nearest trained centroids
    * and takes top-5 across both cells — the recall/cost knob of real IVF
    * (single-probe q74 misses neighbors that fall just over a cell
    * boundary; probing p cells costs p/k of the corpus and recovers them).
    */
  val q79IvfMultiprobe: QueryDef = QueryDef(
    "q79_ivf_multiprobe",
    (s, dir) => {
      import graft.plans.VectorDotProduct
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = KMeans.fitCentroids(emb, k = 4, iters = 2)
      val index = KMeans.assignments(emb, centroids)
        .select(col("vec_id"), col("cluster"), col("embedding")).transform(graft.operators.ScopedCache.cache)
      // two nearest centroids per query vector
      val wq = Window.partitionBy("vec_id").orderBy(col("d2"), col("cluster"))
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(centroids))
        .withColumn("d2", KMeans.d2Col)
        .withColumn("rkc", row_number().over(wq))
        .filter(col("rkc") <= 2)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cluster"))
      val pairD2 = VectorDotProduct(col("embedding"), col("embedding")) -
        lit(2.0d) * VectorDotProduct(col("embedding"), col("q_emb")) +
        VectorDotProduct(col("q_emb"), col("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("d2"), col("vec_id"))
      index.join(broadcast(probes), Seq("cluster"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("d2", Det.rdet(pairD2, 6))
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 5)
        .select("q_id", "rk", "vec_id", "d2")
        .orderBy("q_id", "rk")
    },
    Some(s"""
      WITH ${kmeansCtes(4, 2, 64)},
      qv AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 10),
      qp AS (SELECT q_id, q_emb, cluster FROM (
              SELECT q.q_id, q.q_emb, c2.cluster,
                     row_number() OVER (PARTITION BY q.q_id
                       ORDER BY ${d2Sql("q.q_emb", "c2.centroid", 64)}, c2.cluster) AS rkc
              FROM qv q, c2) WHERE rkc <= 2),
      sc AS (SELECT q_id, a.vec_id AS vec_id,
                    ${Det.rdetSql(d2Sql("a.embedding", "q_emb", 64), 6)} AS d2
             FROM af a JOIN qp USING (cluster) WHERE a.vec_id <> q_id)
      SELECT q_id, rk, vec_id, d2 FROM (
        SELECT q_id, vec_id, d2,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS INTEGER) AS rk
        FROM sc)
      WHERE rk <= 5 ORDER BY q_id, rk"""))

  /** Approximate percentile sketch (the q46 pattern applied to quantiles):
    * the sketch value is engine-specific, so the hashed output carries the
    * exact percentile plus a boolean pinning the approximation inside a 2%
    * relative band — "the sketch ran and was sane" as a hash-checkable fact.
    * The exact anchor comes from the distributed selection path
    * ([[graft.operators.Ranks.interpolatedPercentiles]]) — the
    * `approx_percentile` sketch itself is a bounded mergeable state and
    * stays; only the single-reducer exact `percentile()` aggregate is
    * banned from the surface (PlanSpec).
    */
  val q78ApproxPercentile: QueryDef = QueryDef(
    "q78_approx_percentile",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .transform(graft.operators.ScopedCache.cache)
      val exact = graft.operators.Ranks.interpolatedPercentiles(li,
        Seq("l_returnflag"), col("l_extendedprice"),
        Seq(col("l_orderkey"), col("l_linenumber")), Seq(0.5 -> "p50x"))
      li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"))
        .join(broadcast(exact), "l_returnflag")
        .select(col("l_returnflag"), Det.rdet(col("p50x"), 4).as("p50"),
          (abs(col("ap50") - col("p50x")) <= col("p50x") * 0.02d).as("approx_ok"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
             ${Det.rdetSql("quantile_cont(l_extendedprice, 0.5e0)", 4)} AS p50,
             true AS approx_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) — the
    * multiplicity-preserving duals of q10's distinct variants.
    */
  val q81SetOpsAll: QueryDef = QueryDef(
    "q81_setops_all",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val hi = l.filter(col("l_quantity") >= 25.0d).select("l_partkey")
      val ret = l.filter(col("l_returnflag") === "R").select("l_partkey")
      val both = hi.intersectAll(ret).groupBy("l_partkey")
        .agg(count(lit(1)).as("n_both"))
      val only = hi.exceptAll(ret).groupBy("l_partkey")
        .agg(count(lit(1)).as("n_only"))
      both.join(only, Seq("l_partkey"), "full_outer")
        .orderBy("l_partkey")
    },
    Some("""
      WITH hi AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 25.0e0),
      ret AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
      b2 AS (SELECT l_partkey, count(*) AS n_both
             FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM ret) GROUP BY 1),
      o2 AS (SELECT l_partkey, count(*) AS n_only
             FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM ret) GROUP BY 1)
      SELECT coalesce(b2.l_partkey, o2.l_partkey) AS l_partkey, n_both, n_only
      FROM b2 FULL OUTER JOIN o2 USING (l_partkey)
      ORDER BY l_partkey"""))

  /** Scalar subquery in the SELECT clause (decorrelated by Catalyst into a
    * left outer aggregate join) — the projection-side dual of q51's WHERE
    * correlation.
    */
  val q82ScalarSubquery: QueryDef = QueryDef(
    "q82_scalar_subquery",
    (s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders82")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem82")
      s.sql("""
        SELECT o_orderkey,
               (SELECT count(*) FROM lineitem82 l WHERE l.l_orderkey = o.o_orderkey) AS n_items,
               (SELECT max(l_quantity) FROM lineitem82 l WHERE l.l_orderkey = o.o_orderkey) AS max_qty
        FROM orders82 o
        WHERE o_orderkey <= 2000
        ORDER BY o_orderkey""")
    },
    Some("""
      SELECT o_orderkey,
             (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items,
             (SELECT max(l_quantity) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS max_qty
      FROM orders o
      WHERE o_orderkey <= 2000
      ORDER BY o_orderkey"""))

  /** Regex extraction suite: single-group extract, extract-all re-joined,
    * and a match count, over the document text.
    */
  val q83RegexSuite: QueryDef = QueryDef(
    "q83_regex_suite",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]+)ing\\b", 1).as("first_ing_stem"),
          concat_ws(",", expr("regexp_extract_all(text, '\\\\b[a-z]{10,}\\\\b', 0)")).as("long_words"),
          regexp_count(col("text"), lit("the")).as("n_the"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             coalesce(regexp_extract(text, '([a-z]+)ing\\b', 1), '') AS first_ing_stem,
             coalesce(array_to_string(regexp_extract_all(text, '\\b[a-z]{10,}\\b', 0), ','), '') AS long_words,
             CAST(len(regexp_extract_all(text, 'the', 0)) AS INTEGER) AS n_the
      FROM documents ORDER BY doc_id"""))

  /** Fuzzy (edit-distance) join — the data-cleaning shape: corrupted probe
    * strings matched back to the part catalog with levenshtein <= 2. Probes
    * derive deterministically from every 50th part (3rd char dropped), and
    * candidates are BLOCKED on (first char, length band ±1) before any
    * distance is computed — an equi-join shuffle, not a quadratic string
    * comparison; the length band is sound because one dropped char shifts
    * length by exactly 1.
    */
  val q84FuzzyJoin: QueryDef = QueryDef(
    "q84_fuzzy_join",
    (s, dir) => {
      val parts = Tables.load(s, dir, "part")
      val probes = parts.filter(pmod(col("p_partkey"), lit(50L)) === 0)
        .select(col("p_partkey").as("probe_key"),
          concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)")).as("probe"))
      val cand = parts.select(col("p_partkey"), col("p_name"))
        .withColumn("blk_c", substring(col("p_name"), 1, 1))
        .withColumn("blk_l", explode(array((length(col("p_name")) / 4).cast("long") - 1,
          (length(col("p_name")) / 4).cast("long"),
          (length(col("p_name")) / 4).cast("long") + 1)))
      val pb = probes
        .withColumn("blk_c", substring(col("probe"), 1, 1))
        .withColumn("blk_l", (length(col("probe")) / 4).cast("long"))
      val w = Window.partitionBy("probe_key").orderBy(col("dist"), col("p_partkey"))
      pb.join(cand, Seq("blk_c", "blk_l"))
        .withColumn("dist", levenshtein(col("probe"), col("p_name")))
        .filter(col("dist") <= 2)
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") === 1)
        .select(col("probe_key"), col("p_partkey").as("matched_key"), col("dist"))
        .orderBy("probe_key")
    },
    Some("""
      WITH probes AS (SELECT p_partkey AS probe_key,
                             substr(p_name, 1, 2) || substr(p_name, 4) AS probe
                      FROM part WHERE p_partkey % 50 = 0),
      cand AS (SELECT p_partkey, p_name, substr(p_name, 1, 1) AS blk_c,
                      unnest([length(p_name) // 4 - 1, length(p_name) // 4,
                              length(p_name) // 4 + 1]) AS blk_l
               FROM part),
      pb AS (SELECT probe_key, probe, substr(probe, 1, 1) AS blk_c,
                    length(probe) // 4 AS blk_l
             FROM probes),
      sc AS (SELECT probe_key, p_partkey,
                    CAST(levenshtein(probe, p_name) AS INTEGER) AS dist
             FROM pb JOIN cand USING (blk_c, blk_l)
             WHERE levenshtein(probe, p_name) <= 2)
      SELECT probe_key, matched_key, dist FROM (
        SELECT probe_key, p_partkey AS matched_key, dist,
               CAST(row_number() OVER (PARTITION BY probe_key
                    ORDER BY dist, p_partkey) AS INTEGER) AS rk
        FROM sc)
      WHERE rk = 1 ORDER BY probe_key"""))

  /** Data-quality rule audit (Deequ-style, minimal): each rule is one
    * conditional count over a single scan — the hygiene pass every
    * training-data pipeline runs before anything else.
    */
  val q85DataQuality: QueryDef = QueryDef(
    "q85_data_quality",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders").select(col("o_orderkey"))
      val audited = l.join(o, l("l_orderkey") === o("o_orderkey"), "left")
      audited.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("bad_discount"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("orphan_lineitems"))
    },
    Some("""
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
             CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_lineitems
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey"""))

  /** Chi-square contingency statistic over (returnflag × linestatus):
    * expected counts from the marginals, per-cell terms rounded to 1e-6 and
    * summed as exact scaled longs — the cross-engine-deterministic way to
    * fold float terms (plain double summation is cell-order-dependent).
    */
  val q86ChiSquare: QueryDef = QueryDef(
    "q86_chi_square",
    (s, dir) => {
      val cells = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("o"))
      val rows = cells.groupBy("l_returnflag").agg(sum("o").as("row_n"))
      val cols = cells.groupBy("l_linestatus").agg(sum("o").as("col_n"))
      val n = cells.agg(sum("o").as("n"))
      val term = pow(col("o") - col("e"), 2) / col("e")
      cells.join(broadcast(rows), "l_returnflag")
        .join(broadcast(cols), "l_linestatus")
        .crossJoin(broadcast(n))
        .withColumn("e", col("row_n") * col("col_n") / col("n").cast("double"))
        .agg((sum(floor(term * 1e6 + 0.5).cast("long")) / lit(1e6)).as("chi2"),
          count(lit(1)).cast("int").as("n_cells"))
    },
    Some("""
      WITH cells AS (SELECT l_returnflag, l_linestatus, count(*) AS o
                     FROM lineitem GROUP BY 1, 2),
      r AS (SELECT l_returnflag, sum(o) AS row_n FROM cells GROUP BY 1),
      c AS (SELECT l_linestatus, sum(o) AS col_n FROM cells GROUP BY 1),
      n AS (SELECT sum(o) AS n FROM cells),
      t AS (SELECT o, row_n * col_n / CAST(n AS DOUBLE) AS e
            FROM cells JOIN r USING (l_returnflag)
                 JOIN c USING (l_linestatus) CROSS JOIN n)
      SELECT CAST(sum(CAST(floor(pow(o - e, 2) / e * 1e6 + 0.5e0) AS BIGINT)) AS DOUBLE)
               / 1e6 AS chi2,
             CAST(count(*) AS INTEGER) AS n_cells
      FROM t"""))

  /** Point-in-interval join with time bucketing: gap sessions of the probe
    * users joined to OTHER users' events falling inside the session — the
    * 1-D twin of the geo-cell bucketing: sessions explode into the hour
    * buckets they span, events carry their own hour, the join is an
    * equi-join on the bucket, and the exact containment predicate filters
    * inside buckets. No interval nested-loop at any scale.
    */
  val q87IntervalJoin: QueryDef = QueryDef(
    "q87_interval_join",
    (s, dir) => {
      val hourUs = 3600000000L
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val sessions = e
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("sess", sum("brk").over(w))
        .groupBy(col("user_id").as("s_user"), col("sess"))
        .agg(min("us").as("s_start"), max("us").as("s_end"))
        .filter(col("s_user") < 10)
      val sb = sessions.withColumn("bkt",
        explode(sequence(expr(s"s_start DIV $hourUs"), expr(s"s_end DIV $hourUs"))))
      val eb = e.withColumn("bkt", expr(s"us DIV $hourUs"))
      sb.join(eb, Seq("bkt"))
        .filter(col("user_id") =!= col("s_user") &&
          col("us") >= col("s_start") && col("us") <= col("s_end"))
        .select("s_user", "sess", "event_id").distinct()
        .groupBy("s_user", "sess")
        .agg(count(lit(1)).as("n_other_events"))
        .orderBy("s_user", "sess")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      m AS (SELECT user_id, event_id, us,
              CASE WHEN us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM e),
      s AS (SELECT user_id, event_id, us,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
            FROM m),
      sessions AS (SELECT user_id AS s_user, sess,
                          min(us) AS s_start, max(us) AS s_end
                   FROM s GROUP BY 1, 2 HAVING user_id < 10)
      SELECT s_user, sess, count(DISTINCT event_id) AS n_other_events
      FROM sessions JOIN e
        ON e.us >= s_start AND e.us <= s_end AND e.user_id <> s_user
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** max_by / min_by (argmax) with an explicit struct tiebreak — ties on the
    * value are broken by event_id so the winner is engine-independent; the
    * oracle states the same semantics as window row_numbers.
    */
  val q88ArgMax: QueryDef = QueryDef(
    "q88_argmax",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(
          max_by(col("event_id"), struct(col("value"), col("event_id"))).as("ev_of_max"),
          min_by(col("event_id"), struct(col("value"), col("event_id"))).as("ev_of_min"),
          Det.rdet(max(col("value")), 6).as("v_max"),
          Det.rdet(min(col("value")), 6).as("v_min"))
        .orderBy("user_id"),
    Some("""
      WITH r AS (SELECT user_id, event_id, value,
              row_number() OVER (PARTITION BY user_id
                ORDER BY value DESC, event_id DESC) AS rmax,
              row_number() OVER (PARTITION BY user_id
                ORDER BY value ASC, event_id ASC) AS rmin
            FROM events)
      SELECT user_id,
             max(CASE WHEN rmax = 1 THEN event_id END) AS ev_of_max,
             max(CASE WHEN rmin = 1 THEN event_id END) AS ev_of_min,
             floor(max(value) * 1e6 + 0.5) / 1e6 AS v_max,
             floor(min(value) * 1e6 + 0.5) / 1e6 AS v_min
      FROM r GROUP BY user_id ORDER BY user_id"""))

  /** Null-semantics surface: try_cast under ANSI mode (errors become
    * nulls), nullif / coalesce chains, and null-aware equality (<=>).
    */
  val q92NullHandling: QueryDef = QueryDef(
    "q92_null_handling",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("try_cast(substring(text, 1, 2) AS INT)").as("head_int"),
          nullif(col("lang"), lit("en")).as("lang_non_en"),
          coalesce(nullif(col("source"), lit("web")), lit("fallback")).as("src_or_fallback"),
          (col("lang") <=> lit(null)).as("lang_is_null"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             TRY_CAST(substr(text, 1, 2) AS INTEGER) AS head_int,
             nullif(lang, 'en') AS lang_non_en,
             coalesce(nullif(source, 'web'), 'fallback') AS src_or_fallback,
             (lang IS NOT DISTINCT FROM NULL) AS lang_is_null
      FROM documents ORDER BY doc_id"""))

  /** Calendar arithmetic beyond q16/q48: week truncation and day-of-week,
    * with the engines' different dow conventions mapped explicitly (Spark
    * dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday).
    */
  val q93WeekTrunc: QueryDef = QueryDef(
    "q93_week_trunc",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("week_start", "dow"),
    Some("""
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
             CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
             count(*) AS n
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** The full ranking family over true peer groups (ordering by nationkey
    * inside each segment leaves ties, so rank/dense_rank diverge from
    * row_number and percent_rank/cume_dist expose peer semantics — all
    * still deterministic because peers share their outputs).
    */
  val q94RankFamily: QueryDef = QueryDef(
    "q94_rank_family",
    (s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prnk", Det.rdet(percent_rank().over(w), 6))
        .withColumn("cdist", Det.rdet(cume_dist().over(w), 6))
        .orderBy("c_custkey")
    },
    Some(s"""
      SELECT c_custkey, c_mktsegment, c_nationkey,
             CAST(rank() OVER w AS INTEGER) AS rnk,
             CAST(dense_rank() OVER w AS INTEGER) AS drnk,
             ${Det.rdetSql("percent_rank() OVER w", 6)} AS prnk,
             ${Det.rdetSql("cume_dist() OVER w", 6)} AS cdist
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_nationkey)
      ORDER BY c_custkey"""))

  /** NTILE decile assignment (the one ranking function q94 doesn't cover)
    * with per-decile occupancy and balance stats. The order key carries a
    * unique tiebreak (c_custkey) so bucket boundaries are deterministic;
    * both engines give the first (n mod 10) buckets the extra row. Computed
    * from the distributed global row number (graft.operators.Ranks), not a
    * single-partition ntile window — same SQL semantics, scalable plan.
    */
  val q110DecileStats: QueryDef = QueryDef(
    "q110_decile_stats",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      graft.operators.Ranks
        .globalNtile(c, Seq(col("c_acctbal"), col("c_custkey")), 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          min("c_acctbal").as("bal_lo"), max("c_acctbal").as("bal_hi"),
          dsum(col("c_acctbal")).as("bal_sum"))
        .orderBy("decile")
    },
    Some(s"""
      SELECT decile, count(*) AS n,
             min(c_acctbal) AS bal_lo, max(c_acctbal) AS bal_hi,
             ${dsumSql("c_acctbal")} AS bal_sum
      FROM (SELECT c_custkey, c_acctbal,
              CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER)
                AS decile
            FROM customer)
      GROUP BY decile ORDER BY decile"""))

  /** Recursive CTE (Spark 4.x WITH RECURSIVE): walk the implicit binary
    * tree parent(c) = c div 2 over customer keys from the root, computing
    * each customer's depth — a genuine fixpoint recursion (each level is a
    * frontier join), aggregated to per-depth occupancy. Integer-only, so
    * both engines agree exactly; recursion depth is log2(|customer|),
    * far under Spark's recursion level limit. The DataFrame dual of this
    * machinery is Dedup.dedupClusters' large-star/small-star contraction
    * (q58), which hash-matches a recursive-CTE oracle the same way.
    */
  val q111RecursiveDepth: QueryDef = QueryDef(
    "q111_recursive_depth",
    (s, dir) => {
      // no-spread load: the recursion re-executes this subtree once per
      // level, and each level's join exchange already redistributes — the
      // spread's extra round-robin shuffle would be paid depth times.
      Tables.loadNoSpread(s, dir, "customer")
        .select("c_custkey").createOrReplaceTempView("customer111")
      s.sql("""
        WITH RECURSIVE d(c_custkey, depth) AS (
          SELECT c_custkey, 0 FROM customer111 WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, d.depth + 1
          FROM customer111 c JOIN d ON (c.c_custkey div 2) = d.c_custkey
          WHERE c.c_custkey > 1)
        SELECT depth, count(*) AS n,
               min(c_custkey) AS key_lo, max(c_custkey) AS key_hi
        FROM d GROUP BY depth ORDER BY depth""")
    },
    Some("""
      WITH RECURSIVE d(c_custkey, depth) AS (
        SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
        UNION ALL
        SELECT c.c_custkey, d.depth + 1
        FROM customer c JOIN d ON (c.c_custkey // 2) = d.c_custkey
        WHERE c.c_custkey > 1)
      SELECT depth, count(*) AS n,
             min(c_custkey) AS key_lo, max(c_custkey) AS key_hi
      FROM d GROUP BY depth ORDER BY depth"""))

  /** Correlated EXISTS / NOT EXISTS in SQL form (plans as semi/anti joins —
    * q05/q06 are the DataFrame duals).
    */
  val q95Exists: QueryDef = QueryDef(
    "q95_exists",
    (s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer95")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders95")
      s.sql("""
        SELECT c_custkey,
               EXISTS (SELECT 1 FROM orders95 o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0) AS has_big,
               NOT EXISTS (SELECT 1 FROM orders95 o
                           WHERE o.o_custkey = c.c_custkey) AS no_orders
        FROM customer95 c
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey,
             EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0e0) AS has_big,
             NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey) AS no_orders
      FROM customer c
      ORDER BY c_custkey"""))

  /** SCD2 merge — the lakehouse dimension-maintenance shape (Delta-style
    * MERGE without a table format): an update batch (customers whose 1998+
    * order activity upgrades their segment, effective at their latest order
    * date) closes the current dimension row and opens a new one with
    * validity intervals. Pure join + union — one shuffle on the key; the
    * unchanged majority passes through untouched.
    */
  val q96Scd2Merge: QueryDef = QueryDef(
    "q96_scd2_merge",
    (s, dir) => {
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val upd = Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")) >= 1998)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("eff"))
      val joined = dim.join(upd, Seq("c_custkey"), "left")
      val closedOld = joined.select(col("c_custkey"),
        col("c_mktsegment").as("segment"),
        lit("1990-01-01").cast("date").as("valid_from"),
        col("eff").as("valid_to"))
      val openedNew = joined.filter(col("eff").isNotNull)
        .select(col("c_custkey"), lit("UPGRADED").as("segment"),
          col("eff").as("valid_from"), lit(null).cast("date").as("valid_to"))
      closedOld.unionByName(openedNew)
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    Some("""
      WITH upd AS (SELECT o_custkey AS c_custkey, CAST(max(o_orderdate) AS DATE) AS eff
                   FROM orders WHERE year(o_orderdate) >= 1998 GROUP BY 1),
      j AS (SELECT c.c_custkey, c.c_mktsegment, upd.eff
            FROM customer c LEFT JOIN upd USING (c_custkey))
      SELECT c_custkey, segment, valid_from, valid_to FROM (
        SELECT c_custkey, c_mktsegment AS segment,
               DATE '1990-01-01' AS valid_from, eff AS valid_to FROM j
        UNION ALL
        SELECT c_custkey, 'UPGRADED', eff, NULL FROM j WHERE eff IS NOT NULL)
      ORDER BY c_custkey, valid_from"""))

  /** Hilbert-curve layout key over the q76 domain: per-segment coordinate
    * spans, like the Morton variant but with strictly better locality
    * (consecutive Hilbert keys are always adjacent cells). The rotation
    * state makes the key a per-level fold — chained projections on the
    * Spark side, a CTE chain in the oracle.
    */
  val q98HilbertKey: QueryDef = QueryDef(
    "q98_hilbert_key",
    (s, dir) => {
      val xy = Tables.load(s, dir, "lineitem")
        .select(pmod(col("l_partkey"), lit(256L)).cast("int").as("x"),
          pmod(col("l_suppkey"), lit(256L)).cast("int").as("y"))
      Layout.withHilbert(xy, order = 8, "x", "y", "hd")
        .withColumn("seg", expr("hd DIV 1024"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy("seg")
    },
    Some {
      val (ctes, last) = Layout.hilbertCtesSql(8, "xy")
      s"""
      WITH xy AS (SELECT CAST(l_partkey % 256 AS INTEGER) AS x,
                         CAST(l_suppkey % 256 AS INTEGER) AS y
                  FROM lineitem),
      $ctes
      SELECT hd // 1024 AS seg, count(*) AS n,
             min(x0) AS x_min, max(x0) AS x_max,
             min(y0) AS y_min, max(y0) AS y_max
      FROM $last GROUP BY 1 ORDER BY 1"""
    })

  val all: Seq[QueryDef] = Seq(
    q67AsofJoin, q68Unpivot, q69HashSample, q70KmeansIvf, q71RollingWindow,
    q72StratifiedSample, q73MapFuncs, q74IvfSearch, q75FrameSample,
    q76ZorderKey, q78ApproxPercentile, q79IvfMultiprobe, q81SetOpsAll,
    q82ScalarSubquery, q83RegexSuite, q84FuzzyJoin, q85DataQuality,
    q86ChiSquare, q87IntervalJoin, q88ArgMax, q92NullHandling, q93WeekTrunc,
    q94RankFamily, q95Exists, q96Scd2Merge, q98HilbertKey, q110DecileStats,
    q111RecursiveDepth)
}
