package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{Det, HashFunctions}
import graft.operators.Ranks

/** Round-6 surface, sixth tranche: engine-operations profiling — the
  * queries a platform team runs ABOUT its data to plan the queries it will
  * run ON its data (shuffle-skew advisory, snapshot drift audit, Benford
  * first-digit screening).
  */
object Round6Queries6 {
  private val D38 = DecimalType(38, 0)

  /** SHUFFLE-SKEW ADVISOR for a planned join key — "will a shuffle on this
    * key hot-spot, and would salting help?". One hash aggregate collapses
    * the fact table to per-key counts; every statistic after runs on the
    * KEY relation: max and p99 key weight (p99 via the distributed
    * bucketed-rank selection, no full sort), the top-1 key's share, and the
    * simulated reducer loads of a 32-partition hash shuffle (keys hashed
    * with the engine-portable md5-derived hash32 and summed per bucket).
    * imbalance_ppm = max-bucket ÷ mean-bucket ×10⁶ is the number AQE's
    * skew-join mitigation keys off; >> 10⁶ says "salt or split this key".
    */
  val q185SkewAdvisor: QueryDef = QueryDef(
    "q185_skew_advisor",
    (s, dir) => {
      val kc = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("k")).agg(count(lit(1)).as("cnt"))
      val tot = kc.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
        max("cnt").as("max_key_rows"))
      val p99 = Ranks.selectByRank(kc, Seq.empty, Seq(col("cnt"), col("k")),
          n => floor((n * 99 + 99) / 100).cast("long"), "__r")
        .agg(max("cnt").as("p99_key_rows"))
      val buckets = kc
        .groupBy(pmod(HashFunctions.hash32(col("k").cast("string")), lit(32))
          .as("b"))
        .agg(sum("cnt").as("load"))
        .agg(max("load").as("max_bucket_rows"), count(lit(1)).as("buckets_hit"))
      tot.crossJoin(broadcast(p99)).crossJoin(broadcast(buckets))
        .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
          col("p99_key_rows"),
          Det.ihalfUp(col("max_key_rows") * 1000000L, col("n_rows"))
            .as("top1_ppm"),
          col("buckets_hit"), col("max_bucket_rows"),
          Det.ihalfUp(col("max_bucket_rows") * 32L * 1000000L, col("n_rows"))
            .as("imbalance_ppm"))
    },
    Some(s"""
      WITH kc AS (SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS cnt
                  FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(cnt) AS BIGINT) AS n_rows,
                     CAST(max(cnt) AS BIGINT) AS max_key_rows
              FROM kc),
      rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rn FROM kc),
      p99 AS (SELECT CAST(max(cnt) AS BIGINT) AS p99_key_rows
              FROM rk CROSS JOIN tot
              WHERE rn = CAST(floor((n_keys * 99 + 99) / 100) AS BIGINT)),
      bk AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % 32
                      AS b,
                    CAST(sum(cnt) AS BIGINT) AS load
             FROM kc GROUP BY 1),
      bs AS (SELECT CAST(max(load) AS BIGINT) AS max_bucket_rows,
                    CAST(count(*) AS BIGINT) AS buckets_hit
             FROM bk)
      SELECT n_rows, n_keys, max_key_rows, p99_key_rows,
             ${Det.ihalfUpSql("max_key_rows * 1000000", "n_rows")} AS top1_ppm,
             buckets_hit, max_bucket_rows,
             ${Det.ihalfUpSql("max_bucket_rows * 32 * 1000000", "n_rows")}
               AS imbalance_ppm
      FROM tot CROSS JOIN p99 CROSS JOIN bs"""))

  /** SNAPSHOT DIFF / CDC CLASSIFICATION — the anti-entropy companion to
    * q146's checksums: given yesterday's dimension and today's (today =
    * deterministic mutation: every 97th key deleted, rich accounts
    * re-segmented to PREMIUM, one appended row per supplier), classify
    * every key as added / removed / changed / unchanged with ONE full outer
    * join on the key plus an md5 row-fingerprint comparison — no column-by-
    * column diff, no second scan. Per-class row counts and key checksums
    * are what replicas exchange to converge. Scale: the join shuffles each
    * snapshot once on the key; fingerprints are computed map-side.
    */
  val q186SnapshotDiff: QueryDef = QueryDef(
    "q186_snapshot_diff",
    (s, dir) => {
      def fp(key: org.apache.spark.sql.Column*) = md5(concat_ws("|", key: _*))
      val base = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_name").as("nm"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal"))
      val mutated = base.filter(pmod(col("k"), lit(97)) =!= 0)
        .withColumn("seg",
          when(col("bal") > 900000L, lit("PREMIUM")).otherwise(col("seg")))
      val appended = Tables.load(s, dir, "supplier").select(
        (col("s_suppkey") + 1000000L).as("k"), col("s_name").as("nm"),
        lit("NEW").as("seg"), lit(0L).as("bal"))
      val hOld = base.select(col("k"),
        fp(col("k"), col("nm"), col("seg"), col("bal")).as("h_old"))
      val hNew = mutated.unionByName(appended).select(col("k"),
        fp(col("k"), col("nm"), col("seg"), col("bal")).as("h_new"))
      hOld.join(hNew, Seq("k"), "full_outer")
        .withColumn("class",
          when(col("h_new").isNull, "removed")
            .when(col("h_old").isNull, "added")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged"))
        .groupBy("class")
        .agg(count(lit(1)).as("n"), sum("k").as("key_checksum"))
        .orderBy("class")
    },
    Some("""
      WITH base AS (SELECT c_custkey AS k, c_name AS nm, c_mktsegment AS seg,
                           CAST(floor(c_acctbal * 100 + 0.5e0) AS BIGINT) AS bal
                    FROM customer),
      mutated AS (SELECT k, nm,
                         CASE WHEN bal > 900000 THEN 'PREMIUM' ELSE seg END
                           AS seg,
                         bal
                  FROM base WHERE k % 97 <> 0),
      appended AS (SELECT s_suppkey + 1000000 AS k, s_name AS nm,
                          'NEW' AS seg, CAST(0 AS BIGINT) AS bal
                   FROM supplier),
      h_old AS (SELECT k, md5(concat_ws('|', k, nm, seg, bal)) AS h FROM base),
      h_new AS (SELECT k, md5(concat_ws('|', k, nm, seg, bal)) AS h
                FROM (SELECT * FROM mutated UNION ALL SELECT * FROM appended)),
      j AS (SELECT COALESCE(o.k, n.k) AS k, o.h AS ho, n.h AS hn
            FROM h_old o FULL OUTER JOIN h_new n ON o.k = n.k)
      SELECT CASE WHEN hn IS NULL THEN 'removed'
                  WHEN ho IS NULL THEN 'added'
                  WHEN ho <> hn THEN 'changed'
                  ELSE 'unchanged' END AS class,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS key_checksum
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** BENFORD FIRST-DIGIT SCREENING of order totals — the fraud/synthetic-
    * data smell test: natural multiplicative amounts follow
    * P(d) = log10(1 + 1/d); fabricated ones usually don't. Digits come from
    * the exact cents integer (never float log10); the expected-law
    * probabilities are ×10⁹ integer constants SHARED with the oracle, so
    * observed, expected, and every chi-squared term are pure integer
    * arithmetic — squares accumulate in DECIMAL(38,0) (HUGEINT in DuckDB)
    * per the q171 protocol, with one half-up ÷ to ppm at the leaf. A
    * digit=0 summary row carries n and the total chi². One scan, one
    * 9-row aggregate; everything after is digit-bounded.
    */
  val q187Benford: QueryDef = QueryDef(
    "q187_benford",
    (s, dir) => {
      import s.implicits._
      val p9 = Seq(1 -> 301029996L, 2 -> 176091259L, 3 -> 124938737L,
        4 -> 96910013L, 5 -> 79181246L, 6 -> 66946790L, 7 -> 57991947L,
        8 -> 51152522L, 9 -> 45757491L).toDF("digit", "p9")
      val obs = Tables.load(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .groupBy(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .agg(count(lit(1)).as("observed"))
      val tot = obs.agg(sum("observed").as("n"))
      val terms = obs.join(broadcast(p9), Seq("digit")).crossJoin(broadcast(tot))
        .withColumn("diff",
          (col("observed") * 1000000000L).cast(D38) -
            (col("n") * col("p9")).cast(D38))
        .withColumn("chi2_term_ppm", Det.ihalfUp(
          col("diff") * col("diff") * lit(1000000L).cast(D38),
          (col("n") * col("p9")).cast(D38) * lit(1000000000L).cast(D38)))
        .select(col("digit").cast("long").as("digit"), col("observed"),
          Det.ihalfUp(col("n") * col("p9"), lit(1000L)).as("expected_ppm"),
          col("chi2_term_ppm"))
      val total = terms.agg(sum("observed").as("observed"),
          sum("expected_ppm").as("expected_ppm"),
          sum("chi2_term_ppm").as("chi2_term_ppm"))
        .select(lit(0L).as("digit"), col("observed"), col("expected_ppm"),
          col("chi2_term_ppm"))
      terms.unionByName(total).orderBy("digit")
    },
    Some("""
      WITH p9 AS (SELECT * FROM (VALUES (1, 301029996), (2, 176091259),
                    (3, 124938737), (4, 96910013), (5, 79181246),
                    (6, 66946790), (7, 57991947), (8, 51152522),
                    (9, 45757491)) AS t(digit, p9)),
      obs AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                     CAST(count(*) AS BIGINT) AS observed
              FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5e0) AS BIGINT)
                             AS cents
                    FROM orders)
              WHERE cents > 0 GROUP BY 1),
      tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs),
      terms AS (SELECT o.digit, o.observed,
                       CAST((2*(n * p9) + 1000) // 2000 AS BIGINT)
                         AS expected_ppm,
                       CAST((2 * (CAST(o.observed AS HUGEINT)*1000000000
                                  - CAST(n AS HUGEINT)*p9)
                               * (CAST(o.observed AS HUGEINT)*1000000000
                                  - CAST(n AS HUGEINT)*p9) * 1000000
                             + CAST(n AS HUGEINT)*p9*1000000000)
                            // (2 * CAST(n AS HUGEINT)*p9*1000000000)
                          AS BIGINT) AS chi2_term_ppm
                FROM obs o JOIN p9 ON o.digit = p9.digit CROSS JOIN tot)
      SELECT CAST(digit AS BIGINT) AS digit, observed, expected_ppm,
             chi2_term_ppm
      FROM (SELECT * FROM terms
            UNION ALL
            SELECT 0, CAST(sum(observed) AS BIGINT),
                   CAST(sum(expected_ppm) AS BIGINT),
                   CAST(sum(chi2_term_ppm) AS BIGINT)
            FROM terms)
      ORDER BY digit"""))

  val all: Seq[QueryDef] = Seq(q185SkewAdvisor, q186SnapshotDiff, q187Benford)
}
