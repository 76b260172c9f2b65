package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det

/** Round-5 surface, second tranche: sparse similarity via inverted index,
  * EWMA smoothing by order-pinned IEEE fold, and k-hop BFS reachability.
  */
object Round5Queries2 {

  /** Sparse cosine similarity via the INVERTED INDEX — the IR-native route
    * to pairwise document similarity, complementing the dense-vector ANN
    * family (q33/q34/q49/q74): term-frequency vectors never materialize;
    * the dot product Σ tf_a·tf_b accumulates from a postings self-join on
    * the term — work proportional to Σ df(t)², driven by shared terms only,
    * which is the sparse route's 100 TB advantage over all-pairs dense
    * scoring (with stop-word/df-cap pruning bounding the worst term).
    * Terms are word TRIGRAMS for the same reason as q134: the 31-word
    * vocabulary makes unigram postings dense (every term is a stop word —
    * measured ~387M join rows at sf0.1); trigram df maxes at ~25.
    * Determinism: dots and squared norms are exact integers; cosine =
    * dot/(√A·√B) uses only correctly-rounded IEEE ops (sqrt, multiply,
    * divide) on identical inputs, so both engines rank identically — the
    * top-15 is selected on the RAW double (TakeOrderedAndProject, no global
    * sort) before display rounding.
    */
  val q136SparseCosine: QueryDef = QueryDef(
    "q136_sparse_cosine",
    (s, dir) => {
      val tf = Tables.load(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          explode(graft.plans.WordGrams(col("text"), 3, '_')).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .transform(graft.operators.ScopedCache.cache) // postings feed the norm aggregate AND both join sides
      val norms = tf.groupBy("doc_id")
        .agg(sum(col("tf") * col("tf")).as("nsq"))
      val dots = tf.as("a").join(tf.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("i"), col("nsq").as("na")), "i")
        .join(norms.select(col("doc_id").as("j"), col("nsq").as("nb")), "j")
        .withColumn("cosine",
          col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .orderBy(col("cosine").desc, col("i"), col("j"))
        .limit(15)
        .select(col("i"), col("j"), col("dot"),
          Det.rdet(col("cosine"), 6).as("cosine"))
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                  WHERE len(string_split(text, ' ')) >= 3),
      tf AS (SELECT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS w,
                    CAST(count(*) AS BIGINT) AS tf
             FROM ws, unnest(range(1, len(ws) - 1)) AS u(i) GROUP BY 1, 2),
      norms AS (SELECT doc_id, SUM(tf * tf) AS nsq FROM tf GROUP BY 1),
      dots AS (SELECT a.doc_id AS i, b.doc_id AS j, SUM(a.tf * b.tf) AS dot
               FROM tf a JOIN tf b ON a.w = b.w AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      scored AS (SELECT i, j, CAST(dot AS BIGINT) AS dot,
                        CAST(dot AS DOUBLE) /
                          (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
                          AS cosine
                 FROM dots JOIN norms na ON na.doc_id = i
                           JOIN norms nb ON nb.doc_id = j)
      SELECT i, j, dot, floor(cosine * 1e6 + 0.5) / 1e6 AS cosine
      FROM scored ORDER BY scored.cosine DESC, i, j LIMIT 15"""))

  /** Exponentially-weighted moving average per user — the streaming-
    * smoothing recurrence e ← α·x + (1−α)·e computed as a DETERMINISTIC
    * batch operator: each user's (ts-ordered) values fold sequentially with
    * α = 0.25 (a dyadic rational, exactly representable, as is 1−α = 0.75),
    * so every step is two exact-input IEEE multiplies and one add — both
    * engines execute the identical operation sequence and agree bit-for-bit
    * (the q114 order-pinned-fold protocol). The fold seeds with the FIRST
    * value (matching DuckDB's list_reduce seeding). Per-key state is one
    * array bounded by the user's history — the same bounded-state shape the
    * streaming mapGroupsWithState operators carry; at 100 TB the group
    * collect stays safe because state is per-user, not global.
    */
  val q137Ewma: QueryDef = QueryDef(
    "q137_ewma",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), struct(col("ts"), col("event_id"), col("value")).as("r"))
      ev.groupBy("user_id")
        .agg(transform(array_sort(collect_list(col("r"))), r => r("value")).as("vs"))
        .select(col("user_id"), size(col("vs")).cast("long").as("n_events"),
          Det.rdet(
            aggregate(expr("slice(vs, 2, size(vs) - 1)"), expr("vs[0]"),
              (acc, x) => lit(0.75) * acc + lit(0.25) * x), 6).as("ewma"))
        .orderBy("user_id")
    },
    Some("""
      WITH arr AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY user_id)
      SELECT user_id, n AS n_events,
             floor(list_reduce(vs, (acc, x) -> 0.75e0 * acc + 0.25e0 * x) * 1e6
               + 0.5) / 1e6 AS ewma
      FROM arr ORDER BY user_id"""))

  /** k-hop BFS reachability — frontier expansion on the bipartite
    * supplier–part incidence graph (part ids offset into a disjoint id
    * space; low-quantity lineitems only, which sparsifies the graph enough
    * that 3 hops don't saturate), seeds = suppliers 1–5: three rounds of
    * neighbor-join + min-hop aggregation, each round one equi-join and one
    * hash aggregate (the iterative-relational BFS that scales: the frontier
    * is a DataFrame, never a driver structure). Oracle = the same three
    * rounds unrolled as CTEs. Emits nodes-at-exactly-hop-h counts for
    * h = 0..3 — the reachability histogram a lineage/impact analysis runs
    * over a dependency graph (hop 1 = parts the seed suppliers ship,
    * hop 2 = suppliers co-supplying those parts, hop 3 = their parts).
    */
  val q138BfsKhop: QueryDef = QueryDef(
    "q138_bfs_khop",
    (s, dir) => {
      val e0 = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") <= 2)
        .select(col("l_suppkey").cast("long").as("u"),
          (col("l_partkey") + 1000000L).as("v"))
      val fwd = e0.select(col("u").as("a"), col("v").as("b"))
      val edges = fwd.union(e0.select(col("v").as("a"), col("u").as("b")))
        .distinct().transform(graft.operators.ScopedCache.cache)
      var reached = Tables.load(s, dir, "lineitem").sparkSession
        .range(1, 6).select(col("id").as("node"), lit(0).as("hop"))
      for (h <- 1 to 3) {
        val next = reached.join(edges, col("node") === col("a"))
          .select(col("b").as("node"), lit(h).as("hop"))
        reached = reached.union(next)
          .groupBy("node").agg(min(col("hop")).as("hop"))
          .transform(graft.operators.ScopedCache.cache) // each round feeds the next join AND the final aggregate
      }
      reached.groupBy("hop").agg(count(lit(1)).as("n_nodes")).orderBy("hop")
    },
    Some("""
      WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS u,
                         CAST(l_partkey + 1000000 AS BIGINT) AS v
                  FROM lineitem WHERE l_quantity <= 2),
      edges AS (SELECT DISTINCT a, b FROM (
                  SELECT u AS a, v AS b FROM e0
                  UNION ALL SELECT v AS a, u AS b FROM e0)),
      d0 AS (SELECT CAST(range AS BIGINT) AS node, 0 AS hop FROM range(1, 6)),
      r1 AS (SELECT node, CAST(min(hop) AS INTEGER) AS hop FROM (
               SELECT node, hop FROM d0
               UNION ALL SELECT b AS node, 1 AS hop
               FROM d0 JOIN edges ON d0.node = edges.a) GROUP BY node),
      r2 AS (SELECT node, CAST(min(hop) AS INTEGER) AS hop FROM (
               SELECT node, hop FROM r1
               UNION ALL SELECT b AS node, 2 AS hop
               FROM r1 JOIN edges ON r1.node = edges.a) GROUP BY node),
      r3 AS (SELECT node, CAST(min(hop) AS INTEGER) AS hop FROM (
               SELECT node, hop FROM r2
               UNION ALL SELECT b AS node, 3 AS hop
               FROM r2 JOIN edges ON r2.node = edges.a) GROUP BY node)
      SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
      FROM r3 GROUP BY hop ORDER BY hop"""))

  val all: Seq[QueryDef] = Seq(q136SparseCosine, q137Ewma, q138BfsKhop)
}
