package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Bloom semi-join pruning: exact results (false positives removed), empty
  * build sides, and the map-side placement of the bloom predicate.
  */
class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  test("semiJoin equals exact semi-join semantics") {
    val probe = (0L until 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (0L until 1000L by 7).map(i => (i, "b")).toDF("bk", "tag")
    val got = BloomPrune.semiJoin(probe, col("k"), build, col("bk"), 200L)
      .select("k").as[Long].collect().sorted
    val want = (0L until 1000L).filter(_ % 7 == 0).toArray
    assert(got.sameElements(want))
  }

  test("tiny bloom (high fpp) still yields exact results") {
    val probe = (0L until 2000L).toDF("k")
    val build = Seq(3L, 500L, 1999L).toDF("bk")
    // expectedItems far below reality => saturated filter, many false
    // positives — the exact semi join must still strip them all
    val got = BloomPrune.semiJoin(probe, col("k"), build, col("bk"), 2L, fpp = 0.5)
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 500L, 1999L))
  }

  test("self-sized bloom (expectedItems unset) is exact") {
    val probe = (0L until 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (0L until 1000L by 13).map(i => (i, "b")).toDF("bk", "tag")
    val got = BloomPrune.semiJoin(probe, col("k"), build, col("bk"))
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == (0L until 1000L).filter(_ % 13 == 0).toSeq)
  }

  test("empty build side returns no rows") {
    val probe = (0L until 50L).toDF("k")
    val build = Seq.empty[Long].toDF("bk")
    assert(BloomPrune.semiJoin(probe, col("k"), build, col("bk"), 10L).count() == 0L)
  }

  test("bloom predicate is applied below the join (map-side prune)") {
    // Range, not LocalRelation: ConvertToLocalRelation would otherwise
    // evaluate the bloom filter at plan time and erase it from the plan
    val probe = spark.range(100).toDF("k")
    val build = Seq(1L, 2L).toDF("bk")
    val plan = BloomPrune.semiJoin(probe, col("k"), build, col("bk"), 10L)
      .queryExecution.optimizedPlan
    // the filter must sit on the probe branch, not above the join
    val filters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) => f
    }
    assert(filters.nonEmpty, s"no bloom filter in optimized plan:\n$plan")
    val join = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    assert(join.left.collect { case f if filters.contains(f) => f }.nonEmpty,
      "bloom filter not on the probe side below the join")
  }
}
