package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank against an independent in-memory evaluation of the same integer
  * recurrence, plus structural properties.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: identical integer recurrence over Scala maps. */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val base = (Graph.Scale * 15L / 100L) / n
    var pr = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 0 until iters) {
      val sums = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = nodes.map(v => v -> (base + 85L * sums.getOrElse(v, 0L) / 100L)).toMap
    }
    pr
  }

  test("pageRank matches the in-memory integer recurrence on a random digraph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val got = Graph.pageRank(edges.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got == referencePr(edges, 3))
  }

  test("a sink hub accumulates more rank than its spokes") {
    // star: everyone points at 0
    val edges = (1L to 9L).map(_ -> 0L)
    val pr = Graph.pageRank(edges.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(pr(0L) > pr(1L) * 5, s"hub should dominate: $pr")
    assert((1L to 9L).map(pr).distinct.size == 1, "spokes must tie exactly")
  }

  test("repeated calls on the same edges frame reuse one memoized fit") {
    val edges = (1L to 9L).map(_ -> 0L).toDF("src", "dst")
    val a = Graph.pageRank(edges, 2)
    val b = Graph.pageRank(edges, 2)
    assert(a eq b)
  }

  // ---- large-star/small-star connected components (round 13) ----

  /** Driver-side reference components via union-find. */
  private def referenceCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("connectedComponents labels a random graph by component minimum") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val (labels, _) = Graph.connectedComponents(edges.toDF("src", "dst"))
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == referenceCc(edges))
  }

  test("a 64-node chain converges in ~log2 rounds, not diameter rounds") {
    // THE round-13 ask: min-label propagation needs 63 rounds here (one
    // hop per round); the two-phase contraction must stay logarithmic.
    // log2(64) = 6; allow slack for the +1 stability-observation round
    // and contraction constants, but an O(diameter) regression (63) is
    // far outside the bound.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = Graph.connectedComponents(chain.toDF("src", "dst"))
    assert(rounds <= 10, s"expected O(log n) rounds, took $rounds")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("a 10^5-neighbor hub: no window operator, partial-agg'd mins, " +
    "correct labels") {
    // THE round-13 skew finding: the old Window.partitionBy(u) min put a
    // celebrity vertex's whole adjacency into ONE task's sort buffer —
    // a straggler/OOM by construction on power-law graphs at 100x scale.
    // The fix computes per-u mins as a hash aggregate (map-side partial
    // combine, so no task ever sees the hub's full adjacency) joined
    // back. Pin the shape on a single round's plan, then run the full
    // fixpoint on a 100k-spoke star.
    val hub = spark.range(1, 100001)
      .select(col("id").as("src"), lit(0L).as("dst"))
    val round = Graph.ccRound(hub)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = round.queryExecution.optimizedPlan
    assert(lp.collect { case w: LWindow => w }.isEmpty,
      "a Window survived in the CC round plan")
    assert(lp.collect { case a: Aggregate => a }.nonEmpty,
      "expected the mins as aggregates")
    // physical: the min must run PARTIAL first (map-side combine is what
    // bounds a hub's per-task input)
    assert(round.queryExecution.executedPlan.toString.contains("partial_min"),
      "per-u min is not partial-aggregated")
    val (labels, rounds) = Graph.connectedComponents(hub)
    assert(rounds <= 4, s"hub star should contract immediately, took $rounds")
    val got = labels.agg(count(lit(1)), sum(col("comp")), max(col("v"))).head()
    assert(got.getLong(0) == 100001L, "one label per vertex")
    assert(got.getLong(1) == 0L, "every component label is the hub (min id 0)")
    assert(got.getLong(2) == 100000L, "all spokes labeled")
  }

  test("connectedComponents: empty edges converge in zero rounds") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val (labels, rounds) = Graph.connectedComponents(empty)
    assert(rounds == 0 && labels.count() == 0)
  }

  test("connectedComponents refuses to return split components") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(chain.toDF("src", "dst"), maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
