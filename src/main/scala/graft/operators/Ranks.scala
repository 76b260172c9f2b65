package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — total-order row numbers without ever moving
  * the data to a single partition.
  *
  * `Window.orderBy(...)` with no partition spec is the textbook scale
  * defect: Spark warns ("No Partition Defined for Window operation") and
  * funnels every row through ONE task — fine at 10k rows, fatal at 100 TB.
  * The scalable shape is the classic two-phase rank:
  *
  *   1. range-repartition on the sort key (a distributed sort's exchange:
  *      partition i holds keys strictly below partition i+1's);
  *   2. per-partition `row_number` (WindowExec with a partition spec —
  *      parallel, no global funnel);
  *   3. add each partition's cumulative row-count offset, computed from a
  *      per-partition count aggregate that is O(numPartitions) rows.
  *
  * Step 3's tiny cumulative sum runs as a window over `spark_partition_id`
  * partitioned by a constant — one task over ~numShufflePartitions rows,
  * independent of data size. Catalyst's ReuseExchange collapses the two
  * consumers of the range exchange into one physical shuffle, so the input
  * is shuffled once and scanned twice from shuffle files.
  *
  * The sort key MUST be a total order (include a unique tiebreaker):
  * range-partition boundaries may split ties across partitions, and with
  * duplicate keys the per-partition numbering would depend on boundary
  * placement. With a total order the result is exact and identical under
  * any partition count — the invariance gate (4 vs 32 shuffle partitions)
  * holds by construction.
  */
object Ranks {

  /** Appends `out` = the 1-based global row number of each row under the
    * total order `sort` (which must include a unique tiebreaker).
    */
  def globalRowNumber(df: DataFrame, sort: Seq[Column], out: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, sort: _*)
      .withColumn("__pid", spark_partition_id())
    // O(numPartitions) rows: the constant partition key keeps WindowExec off
    // the no-partition path without changing the (single, tiny) task shape
    val offW = Window.partitionBy(lit(0)).orderBy(col("__pid"))
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", sum(col("__cnt")).over(offW) - col("__cnt"))
      .select(col("__pid"), col("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    ranged
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + col("__rn"))
      .drop("__pid", "__off", "__rn")
  }

  /** NTILE over the global order, computed from the distributed row number
    * instead of a single-partition window: with n rows and k tiles, the
    * first n mod k tiles take ceil(n/k) rows (SQL ntile semantics).
    * `totalCount` joins in as a broadcast scalar.
    */
  /** Exact long integer division for non-negative operands: the numerator is
    * made divisible first, so the double-typed `/` is exact below 2^53.
    */
  private def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")

  def globalNtile(df: DataFrame, sort: Seq[Column], k: Int, out: String): DataFrame = {
    val ranked = globalRowNumber(df, sort, "__i")
    val total = df.groupBy().agg(count(lit(1)).as("__n"))
    val base = idiv(col("__n"), lit(k.toLong)) // rows in a small tile
    val extra = col("__n") % k // tiles holding base+1 rows
    val cut = (base + 1L) * extra // rows covered by the big tiles
    // CaseWhen evaluates per-branch, so base=0 (n < k) never divides by zero:
    // cut = n makes the first branch cover every row
    val tile = when(col("__i") <= cut, idiv(col("__i") - 1L, base + 1L) + 1L)
      .otherwise(extra + idiv(col("__i") - cut - 1L, base) + 1L)
    ranked.crossJoin(broadcast(total))
      .withColumn(out, tile.cast("int"))
      .drop("__i", "__n")
  }
}
