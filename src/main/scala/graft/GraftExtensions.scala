package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.plans.{BucketedRangeJoinRule, SortedLongArrayIntersectCount}

/** SparkSessionExtensions hook registering graft's native expressions and
  * optimizer rules. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * (The Column API in graft.plans works without registration; the range-join
  * rewrite can also be installed per-session via
  * `spark.experimental.extraOptimizations`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongArrayIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongArrayIntersectCount(children(0), children(1))))
    ext.injectOptimizerRule(_ => BucketedRangeJoinRule)
  }
}
