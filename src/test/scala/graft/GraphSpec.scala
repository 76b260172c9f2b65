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
}
