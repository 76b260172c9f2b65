package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Det, HashFunctions}

/** Round-4 surface, third tranche: triangle counting and an exactly-
  * reproducible count-min sketch. Determinism per [[graft.functions.Det]].
  */
object Round4Queries3 {

  private def h32(x: String): String = s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"
  private def h32at(x: String, pos: Int): String =
    s"(('0x' || substr(md5($x), $pos, 8))::BIGINT)"

  /** Triangle counting — the standard distributed formulation: orient every
    * undirected edge from its smaller to its larger endpoint (kills
    * duplicate and reversed listings AND makes each triangle countable
    * exactly once as a<b<c), then two hash-partitioned equi-joins: wedges
    * a→b→c closed by the a→c edge. Join traffic is Σ deg²(v) wedges — the
    * orientation bounds it by the H-index of the degree sequence, which is
    * why the ordered form (not the naive 6-fold symmetric join) is the one
    * that survives skewed degree distributions at scale. The graph is the
    * supplier×part-bucket quotient co-occurrence graph (same family as
    * q115's PageRank input), so edge cardinality is domain-bounded and the
    * exhibit is the plan shape, not a data-volume stunt. Emits the global
    * triangle count plus the wedge count (the clustering-coefficient
    * denominator).
    */
  val q128Triangles: QueryDef = QueryDef(
    "q128_triangles",
    (s, dir) => {
      val e0 = Tables.load(s, dir, "lineitem")
        .select((col("l_suppkey") % 100).as("u"), (col("l_partkey") % 100).as("v"))
        .filter(col("u") =!= col("v"))
      // canonical orientation low→high, deduplicated
      val edges = e0.select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b")).distinct().transform(graft.operators.ScopedCache.cache)
      val wedges = edges.as("e1")
        .join(edges.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
      val triangles = wedges.as("w")
        .join(edges.as("e3"), col("w.a") === col("e3.a") && col("w.c") === col("e3.b"))
      triangles.agg(count(lit(1)).as("n_triangles"))
        .crossJoin(broadcast(wedges.agg(count(lit(1)).as("n_wedges"))))
        .select(col("n_triangles"), col("n_wedges"))
    },
    Some("""
      WITH e0 AS (SELECT CAST(l_suppkey % 100 AS BIGINT) AS u,
                         CAST(l_partkey % 100 AS BIGINT) AS v
                  FROM lineitem WHERE l_suppkey % 100 != l_partkey % 100),
      edges AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e0),
      wedges AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                 FROM edges e1 JOIN edges e2 ON e1.b = e2.a),
      tri AS (SELECT count(*) AS n_triangles
              FROM wedges w JOIN edges e3 ON w.a = e3.a AND w.c = e3.b),
      wc AS (SELECT count(*) AS n_wedges FROM wedges)
      SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
             CAST(n_wedges AS BIGINT) AS n_wedges
      FROM tri CROSS JOIN wc"""))

  /** Count-min sketch, exactly reproducible: d=4 hash rows (independent
    * 8-hex windows of one md5 digest, [[HashFunctions.hash32At]]) × w=512
    * buckets. The sketch is ONE hash aggregate over (row, bucket) — 2048
    * mergeable counters regardless of stream size, the map-side-combinable
    * shape a 100 TB frequency service maintains. Point queries then read
    * est = min over rows of the probed bucket via a broadcast join of the
    * 2048-counter sketch. Every hash derives from md5, so the DuckDB oracle
    * rebuilds the IDENTICAL sketch and the estimates match bit-for-bit —
    * alongside the exact counts, exposing the (always ≥ 0) overestimation
    * error the epsilon-delta bound promises.
    */
  val q129CountMin: QueryDef = QueryDef(
    "q129_count_min",
    (s, dir) => {
      val W = 512
      val positions = Seq(1, 9, 17, 25)
      val words = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
      // the sketch: one counts pass over d×w cells
      val cells = words.select(positions.zipWithIndex.map { case (p, i) =>
          (HashFunctions.hash32At(col("word"), p) % W).as(s"b$i")
        }: _*)
        .select(explode(array(positions.indices.map(i =>
          struct(lit(i).as("row"), col(s"b$i").as("bucket"))): _*)).as("cell"))
        .select(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
        .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
        .transform(graft.operators.ScopedCache.cache) // 2048 rows, probed by 4 joins — never recount the corpus
      // point queries: every distinct word probes its d cells
      val probes = words.groupBy("word").agg(count(lit(1)).as("exact_c"))
        .select((col("word") +: col("exact_c") +: positions.zipWithIndex.map {
          case (p, i) => (HashFunctions.hash32At(col("word"), p) % W).as(s"b$i")
        }): _*)
      val est = positions.indices.foldLeft(probes) { (df, i) =>
        df.join(broadcast(cells.filter(col("row") === i)
            .select(col("bucket").as(s"b$i"), col("c").as(s"c$i"))), s"b$i")
      }
      est.select(col("word"), col("exact_c"),
          least(col("c0"), col("c1"), col("c2"), col("c3")).as("est_c"))
        .orderBy("word")
    },
    Some(s"""
      WITH w AS (SELECT word FROM
                   (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                 WHERE word != ''),
      cells AS (
        SELECT row, bucket, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest([0, 1, 2, 3]) AS row,
                 unnest([${h32at("word", 1)} % 512, ${h32at("word", 9)} % 512,
                         ${h32at("word", 17)} % 512, ${h32at("word", 25)} % 512])
                   AS bucket
          FROM w)
        GROUP BY row, bucket),
      probes AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_c,
                        ${h32at("word", 1)} % 512 AS b0,
                        ${h32at("word", 9)} % 512 AS b1,
                        ${h32at("word", 17)} % 512 AS b2,
                        ${h32at("word", 25)} % 512 AS b3
                 FROM w GROUP BY word)
      SELECT word, exact_c, least(c0.c, c1.c, c2.c, c3.c) AS est_c
      FROM probes
      JOIN cells c0 ON c0.row = 0 AND c0.bucket = b0
      JOIN cells c1 ON c1.row = 1 AND c1.bucket = b1
      JOIN cells c2 ON c2.row = 2 AND c2.bucket = b2
      JOIN cells c3 ON c3.row = 3 AND c3.bucket = b3
      ORDER BY word"""))

  /** Bitmap-index cohort intersection — the OLAP bitmap acceleration
    * pattern: per (day, event_type) the active-user SET packs into 63-bit
    * longs (bucket = user div 63, bit = user mod 63; the sign bit stays
    * clear so both engines shift identically), built with one `bit_or`
    * hash aggregate. Cohort overlap then reads `bit_count(a AND b)` over
    * the tiny bitmap relation — distinct-user intersections across periods
    * WITHOUT re-shuffling user ids per comparison. At 100 TB this is the
    * compressed-bitmap (roaring-style) segment index: membership set ops
    * become bitwise ops over kilobytes. Emits per-day purchase/error cohort
    * sizes, their intersection, and Jaccard.
    */
  val q130BitmapCohorts: QueryDef = QueryDef(
    "q130_bitmap_cohorts",
    (s, dir) => {
      val dayUs = 86400000000L
      def cohort(t: String, out: String) =
        Tables.load(s, dir, "events")
          .filter(col("event_type") === t)
          .select(expr(s"unix_micros(ts) DIV $dayUs").as("day"),
            expr("user_id DIV 63").as("bkt"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").as("m"))
          .groupBy("day", "bkt")
          .agg(bit_or(col("m")).as(out))
      val joined = cohort("purchase", "pb").join(cohort("error", "eb"),
        Seq("day", "bkt"), "full_outer")
        .select(col("day"),
          coalesce(col("pb"), lit(0L)).as("pb"),
          coalesce(col("eb"), lit(0L)).as("eb"))
      joined.groupBy("day")
        .agg(sum(bit_count(col("pb"))).as("n_purchase"),
          sum(bit_count(col("eb"))).as("n_error"),
          sum(bit_count(col("pb").bitwiseAND(col("eb")))).as("n_both"))
        .select(col("day"), col("n_purchase"), col("n_error"), col("n_both"),
          Det.rdet(col("n_both").cast("double") /
            (col("n_purchase") + col("n_error") - col("n_both")), 6).as("jaccard"))
        .orderBy("day")
    },
    Some("""
      WITH p AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id // 63 AS bkt,
                        bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS pb
                 FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id // 63 AS bkt,
                   bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS eb
            FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      j AS (SELECT COALESCE(p.day, e.day) AS day,
                   COALESCE(pb, 0) AS pb, COALESCE(eb, 0) AS eb
            FROM p FULL OUTER JOIN e ON p.day = e.day AND p.bkt = e.bkt),
      agg AS (SELECT day, CAST(SUM(bit_count(pb)) AS BIGINT) AS n_purchase,
                     CAST(SUM(bit_count(eb)) AS BIGINT) AS n_error,
                     CAST(SUM(bit_count(pb & eb)) AS BIGINT) AS n_both
              FROM j GROUP BY day)
      SELECT day, n_purchase, n_error, n_both,
             floor((CAST(n_both AS DOUBLE) / (n_purchase + n_error - n_both))
               * 1e6 + 0.5) / 1e6 AS jaccard
      FROM agg ORDER BY day"""))

  /** Weighted median — quantity-weighted price midpoint per return flag:
    * the row where the running weight (in price order) first reaches
    * ceil(W/2). Runs on [[graft.operators.Ranks.selectByWeightedRank]]:
    * bucket weight-sums locate the target bucket, only its rows see the
    * running-sum window. Integer weights keep every cumulative sum exact,
    * so both engines select the identical row. The robust "typical price
    * paid per unit" — a volume-weighted percentile, computed by counting,
    * not sorting.
    */
  val q131WeightedMedian: QueryDef = QueryDef(
    "q131_weighted_median",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_returnflag").as("flag"), col("l_extendedprice").as("v"),
        floor(col("l_quantity") + 0.5).cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
      graft.operators.Ranks.selectByWeightedRank(li, Seq(col("flag")),
          Seq(col("v"), col("l_orderkey"), col("l_linenumber")),
          col("w"), wTot => floor((wTot + 1L) / 2L).cast("long"), "cw")
        .select(col("flag"), col("v").as("wmedian"), col("cw"))
        .orderBy("flag")
    },
    Some("""
      WITH li AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
                         CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS w,
                         l_orderkey, l_linenumber
                  FROM lineitem),
      t AS (SELECT flag, (SUM(w) + 1) // 2 AS tgt FROM li GROUP BY flag),
      c AS (SELECT flag, v, w,
              SUM(w) OVER (PARTITION BY flag
                ORDER BY v, l_orderkey, l_linenumber
                ROWS UNBOUNDED PRECEDING) AS cw
            FROM li)
      SELECT c.flag AS flag, v AS wmedian, CAST(cw AS BIGINT) AS cw
      FROM c JOIN t ON c.flag = t.flag
      WHERE cw - w < tgt AND tgt <= cw ORDER BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q128Triangles, q129CountMin, q130BitmapCohorts, q131WeightedMedian)
}
