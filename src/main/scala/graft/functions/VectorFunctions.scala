package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns.
  *
  * Pure Catalyst higher-order functions (`zip_with` + `aggregate`) — fully
  * codegen'd, no UDFs, and a deterministic left-to-right fold so the sums are
  * bit-reproducible against the DuckDB oracle. Elements are cast to double
  * before any arithmetic so float inputs don't accumulate in single precision.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left fold sum of an array<double> column. */
  private def fsum(v: Column): Column = aggregate(v, lit(0.0d), (s, x) => s + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  def norm2(a: Column): Column = sqrt(fsum(transform(a, x => {
    val d = x.cast("double"); d * d
  })))

  /** Cosine similarity in [-1, 1]; null-safe only insofar as null arrays
    * propagate null.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    fsum(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)))
}
