package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-summary sketches with exact verification.
  *
  * The pattern mirrors [[BloomPrune]]: a compact, mergeable one-pass summary
  * produces a small CANDIDATE set with a superset guarantee, then one exact
  * pass over the candidates removes false positives — so the final answer is
  * exact while the expensive full-data operation (here: a full groupBy over
  * every distinct item) never runs.
  *
  * Reference tie-in: the reference collects the whole table to the driver and
  * loops in Python to find per-category structure (functions.py:213-227); at
  * 100 TB the only viable shape is a bounded-memory per-partition summary
  * plus a candidate-verify join, which is what this module provides.
  */
object Sketches {

  /** Misra–Gries heavy-hitter CANDIDATES over `item`: every value with
    * frequency > n/k is guaranteed to survive (classic MG superset
    * guarantee), possibly alongside false positives.
    *
    * Each partition keeps at most k−1 counters (O(k) memory regardless of
    * partition size); an item with global count > n/k must exceed its own
    * partition's local threshold in at least one partition, so the union of
    * per-partition survivors is a valid global candidate set of at most
    * (k−1)·numPartitions rows — broadcast-sized for any practical k.
    */
  def heavyHitterCandidates(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val items = df.select(item.cast("string").as("item")).filter(col("item").isNotNull)
    val session = items.sparkSession
    import session.implicits._
    items.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1L)
          case None if counters.size < k - 1 => counters.update(x, 1L)
          case None =>
            // decrement-all step: drop one occurrence of every tracked item
            counters.mapValuesInPlace((_, v) => v - 1L)
            counters.filterInPlace((_, v) => v > 0L)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
  }

  /** EXACT heavy hitters (count > n/k) via sketch-then-verify: MG candidates
    * broadcast into a semi join prune, one counting pass over survivors, and
    * the exact threshold filter. Output: (item, cnt), exact — identical to
    * `GROUP BY item HAVING count(*)*k > n` but without a full-cardinality
    * aggregation (the only wide op is keyed by the ≤ (k−1)·parts candidates).
    */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    val items = df.select(item.cast("string").as("item")).filter(col("item").isNotNull)
    val cand = heavyHitterCandidates(items, col("item"), k)
    val total = items.groupBy().agg(count(lit(1)).as("__total"))
    items
      .join(broadcast(cand), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("__total"))
      .select(col("item"), col("cnt"))
  }
}
