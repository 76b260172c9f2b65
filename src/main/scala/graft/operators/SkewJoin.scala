package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.5 scale posture).
  *
  * When one join key carries a disproportionate share of rows, a plain
  * shuffle join lands that key on one reducer. Salting splits each fact key
  * into `saltBuckets` sub-keys and replicates the dimension row into every
  * bucket, spreading the hot key across `saltBuckets` tasks. AQE's skew-join
  * handling covers sort-merge joins at runtime; explicit salting remains the
  * tool for aggregate-free hash joins and for engines/pipelines where AQE
  * can't see the skew (e.g. skew appearing after a transformation).
  *
  * The salt is deterministic (pmod of a row hash of the fact's key + a
  * monotonic component would break reproducibility — we use pmod of the
  * fact's own unique id), so results are stable run to run.
  */
object SkewJoin {

  /** Join `fact` to `dim` on `factKey === dimKey`, salting the fact side by
    * `saltOn` (any deterministic per-row column, e.g. the fact's primary
    * key). Output = inner-join rows, exactly as the unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
                 saltOn: Column, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(saltOn, lit(saltBuckets.toLong)).cast("int"))
    val expandedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(expandedDim,
        factKey === dimKey && salted("__salt") === expandedDim("__salt"))
      .drop("__salt")
  }
}
