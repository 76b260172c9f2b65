package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality metrics via `Dataset.observe`: the counters ride
  * the job that produces the output, evaluated per-row inside the existing
  * scan — no second pass over the data. Where q85's audit runs the rules as
  * a standalone query, this attaches the same class of rules to ANY
  * pipeline's write, which is how a 100 TB job affords monitoring (a
  * dedicated audit scan of the same input would double the I/O bill).
  *
  * Usage:
  * {{{
  *   val obs = new Observation("quality")
  *   Observe.withQualityMetrics(df, obs, notNull = Seq("user_id"),
  *     nonNegative = Seq("value")).write.parquet(out)
  *   val m = obs.get   // Map: n_rows, null_user_id, neg_value
  * }}}
  */
object Observe {

  /** The metric columns: total rows, a null counter per `notNull` column,
    * and a negative counter per `nonNegative` column. All are plain
    * aggregate expressions — whole-stage-codegen'd alongside the query.
    */
  def qualityMetrics(notNull: Seq[String], nonNegative: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +:
      (notNull.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) ++
        nonNegative.map(c =>
          sum(when(col(c) < 0, 1L).otherwise(0L)).as(s"neg_$c")))

  /** Attach the quality counters to the frame under `obs`; the observation
    * resolves after the frame's next action with the violation counts.
    */
  def withQualityMetrics(df: DataFrame, obs: Observation,
                         notNull: Seq[String], nonNegative: Seq[String]): DataFrame = {
    val ms = qualityMetrics(notNull, nonNegative)
    df.observe(obs, ms.head, ms.tail: _*)
  }
}
