package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the standard shuffle-avoidance pattern
  * for "big probe ⋉ medium build" joins at 100 TB.
  *
  * A plain semi join shuffles EVERY probe row on the join key; when the
  * build side is too large to broadcast exactly but its keys fit a few MB of
  * bloom bits, probing the bloom before the shuffle drops the (typically
  * vast) non-matching majority at the scan, so only candidate rows pay the
  * exchange. The filter is applied map-side as a codegen'd native predicate;
  * the exact semi join afterwards removes the bloom's false positives, so
  * the RESULT is exact regardless of fpp — the bloom only prunes.
  *
  * Built on Spark's own sketch machinery (the expressions behind
  * spark.sql.optimizer.runtime.bloomFilter — reused directly rather than
  * reimplemented): a distributed BloomFilterAggregate over xxhash64(key)
  * collapses to ONE binary blob on the driver, which rides into the probe
  * plan as a foldable literal inside BloomFilterMightContain. Catalyst's own
  * runtime-filter injection only fires on selective broadcast-joined dims;
  * this operator makes the same plan available on demand for any build side.
  *
  * The reference's analogue is pushing the bbox to the OpenSky server so
  * non-matching rows never travel (scripts/functions.py:42-50) — here the
  * "server" is the scan stage and the bbox is a bitset of key hashes.
  */
object BloomPrune {

  /** `probe` rows whose `probeKey` appears in `build`'s `buildKey` — exact
    * semi-join semantics, bloom-accelerated. `expectedItems` sizes the bloom
    * for the build-side distinct-key cardinality; fpp is the false-positive
    * rate at that size (pruning power degrades, correctness never). Pass
    * `expectedItems <= 0` to size from the MEASURED build cardinality: one
    * cheap extra count job on the (smaller) build side buys a bloom that is
    * neither 10× oversized (wasted broadcast bytes at small scale) nor
    * undersized (fpp collapse at large scale) when the build's selectivity
    * isn't known ahead of time — the sizing then tracks the data across
    * scale factors instead of freezing a guess.
    */
  def semiJoin(probe: DataFrame, probeKey: Column, build: DataFrame, buildKey: Column,
               expectedItems: Long = -1L, fpp: Double = 0.03): DataFrame = {
    val keys = build.select(buildKey.as("__bloom_key"))
    val items = if (expectedItems > 0) expectedItems
      else math.max(1L, keys.count())
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(col("__bloom_key")))),
      Literal(items), Literal(numBits))
      .toAggregateExpression()
    // one job, one ~numBits/8-byte result row on the driver
    val blob = keys.select(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
    val pruned =
      if (blob == null) probe // empty build side: nothing can match anyway
      else probe.filter(GraftBridge.column(BloomFilterMightContain(
        Literal(blob, BinaryType),
        new XxHash64(Seq(GraftBridge.expression(probeKey))))))
    pruned.join(keys.distinct(), probeKey === col("__bloom_key"), "leftsemi")
  }
}
