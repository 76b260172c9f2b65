package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * technique for Spark extension libraries that define native Catalyst
  * expressions with a Column API (Spark 4 moved Column to ColumnNode; the
  * conversion helpers live in org.apache.spark.sql.classic.ExpressionUtils).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Rebuild `df` as a LEAF plan (a [[execution.LogicalRDD]] over its own
    * physical rows) — lineage truncation for iterative fixpoints.
    *
    * An iterative operator whose round plan references the previous
    * round's frame MORE THAN ONCE (e.g. a per-key aggregate joined back
    * to its own input) grows k^rounds plan SUBTREES: plan objects share
    * references, but every tree-shaped walk — `explainString`, a
    * canonicalization, any copying `transform` — visits (and under
    * transforms, COPIES) the shared subtree once per path, which is what
    * OOM'ed the union-shaped CC rounds this repo replaced in round 12.
    * Truncating each materialized round to a leaf makes every round plan
    * O(1) deep regardless of how many times the next round references it.
    *
    * The caller MUST have materialized `df` (cached + counted): the leaf's
    * RDD is `queryExecution.toRdd`, which scans the InMemoryRelation while
    * the cache lives and recomputes through normal lineage if it is
    * evicted — correctness never depends on the cache being present.
    */
  def truncateLineage(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val qe = ds.queryExecution
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD(qe.analyzed.output, qe.toRdd)(ds.sparkSession))
  }

  /** Register a native function on an existing session's function registry
    * (SparkSessionExtensions only applies while a session is being built).
    */
  def registerFunction(spark: SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
