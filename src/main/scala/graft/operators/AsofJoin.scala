package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of backward") join: each probe row picks the single
  * latest build row with the same key and build time <= probe time.
  *
  * Spark has no native as-of join; the scalable formulation is a UNION +
  * WINDOW, not a join: interleave both sides on (key, time, side) and carry
  * the latest build payload forward with last(_, ignoreNulls) over ROWS
  * UNBOUNDED PRECEDING..CURRENT. One shuffle on the key, no join node, and
  * no pair blow-up on hot keys (contrast the equi-join + max(time) rewrite,
  * which shuffles twice and materializes every <= pairing before pruning).
  * Build rows sort BEFORE probe rows at equal timestamps, so "at or before"
  * is inclusive.
  *
  * Caller contract: build rows are unique per (key, time) — pre-aggregate
  * otherwise the carried payload at a tied time would be nondeterministic —
  * and payload columns are non-null on build rows (null payloads would be
  * skipped by the ignoreNulls carry and read through to an older row).
  */
object AsofJoin {

  /** @param probe   left side; all its columns are kept
    * @param build   right side; must contain `key`, `time` and the payload
    * @param key     equi-key column name present on both sides
    * @param time    event-time column name present on both sides
    * @param payload build columns carried onto each probe row (null when no
    *                build row exists at or before the probe time)
    */
  def backward(probe: DataFrame, build: DataFrame, key: String, time: String,
               payload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.filterNot(c => c == key || c == time).toSeq
    require(probeCols.intersect(payload).isEmpty,
      s"probe and payload column names must be disjoint: ${probeCols.intersect(payload)}")
    require(payload.forall(build.columns.contains),
      s"payload columns missing from build side: ${payload.filterNot(build.columns.contains)}")
    val buildSide = build.select(
      Seq(col(key), col(time), lit(0).as("__side")) ++
        payload.map(col) ++ probeCols.map(c => lit(null).as(c)): _*)
    val probeSide = probe.select(
      Seq(col(key), col(time), lit(1).as("__side")) ++
        payload.map(c => lit(null).as(c)) ++ probeCols.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buildSide.unionByName(probeSide)
      .select(Seq(col(key), col(time), col("__side")) ++ probeCols.map(col) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
