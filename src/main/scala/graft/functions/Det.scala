package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for oracle-comparable results.
  *
  * Two cross-engine hazards are neutralized here:
  *
  *  1. Float summation order: Spark's partial/final aggregation sums doubles
  *     in partition order, the oracle sums in scan order. [[dsum]] accumulates
  *     in exact DECIMAL(30,8) (order-independent integer arithmetic) and only
  *     converts to double at the end — bit-identical across engines.
  *
  *  2. `round()` tie semantics: Spark rounds the shortest decimal repr
  *     (BigDecimal.valueOf) while other engines round the binary value —
  *     results can differ at exact ties. [[rdet]] uses floor(x*10^k + 0.5) /
  *     10^k, which is pure IEEE arithmetic and therefore reproduces exactly
  *     in any engine.
  */
object Det {

  /** Deterministic half-up rounding to k decimals: floor(x*10^k + 0.5)/10^k. */
  def rdet(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * p + 0.5) / p
  }

  /** Order-independent sum of a double column via exact decimal accumulation,
    * returned as a double with cents (2-decimal) resolution.
    *
    * The conversion deliberately routes through `floor(sum*100)` cast to
    * BIGINT and divided by 100.0: a direct DECIMAL→DOUBLE cast is NOT
    * engine-portable once the scaled integer exceeds 2^53 (observed at
    * sf0.1: DuckDB's int128→double→/10^scale path lands 1 ulp away from
    * Spark's correctly-rounded BigDecimal conversion). Both engines produce
    * the identical BIGINT, int64→double is correctly rounded everywhere,
    * and the final division is a shared IEEE operation.
    */
  def dsum(c: Column): Column =
    floor(sum(c.cast(DecimalType(30, 8))) * 100).cast("long") / 100.0d

  /** SQL fragment mirroring [[dsum]] for oracle text. */
  def dsumSql(expr: String): String =
    s"CAST(floor(SUM(CAST(($expr) AS DECIMAL(30,8))) * 100) AS BIGINT) / 100.0e0"

  /** SQL fragment mirroring [[rdet]] for oracle text. */
  def rdetSql(expr: String, k: Int): String =
    s"floor(($expr) * 1e$k + 0.5) / 1e$k"

  /** Half-up rounding to k decimals emitted as a ×10^k-scaled BIGINT —
    * [[rdet]] without the final division, so no double ever reaches the
    * output schema. Use for oracle-compared result columns: downstream
    * hashers are then comparing integers, immune to any double
    * canonicalization difference between checkers.
    */
  def rdetLong(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * p + 0.5).cast("long")
  }

  /** SQL fragment mirroring [[rdetLong]] for oracle text. */
  def rdetLongSql(expr: String, k: Int): String =
    s"CAST(floor(($expr) * 1e$k + 0.5) AS BIGINT)"

  /** Round-half-up of the NONNEGATIVE integer ratio num/den computed entirely
    * in integer arithmetic — (2·num + den) div (2·den) — so no double (and no
    * DECIMAL→DOUBLE cast, see [[dsum]]'s caveat) ever participates. Exact and
    * engine-portable at any magnitude the operand type holds: pass
    * DECIMAL(38,0)-cast columns for sums that can exceed int64 (the DuckDB
    * mirror promotes to HUGEINT on its own). Requires num ≥ 0, den > 0.
    */
  def ihalfUp(num: Column, den: Column): Column = {
    val n2 = num * 2 + den
    val d2 = den * 2
    ((n2 - n2 % d2) / d2).cast("long")
  }

  /** SQL fragment mirroring [[ihalfUp]]: DuckDB `//` is exact integer
    * division (trunc — equal to floor for the nonnegative operands required
    * here), and BIGINT sums are already HUGEINT so nothing overflows.
    */
  def ihalfUpSql(num: String, den: String): String =
    s"CAST((2*($num) + ($den)) // (2*($den)) AS BIGINT)"

  /** [[ihalfUp]] for a possibly-negative numerator: rounds half away from
    * zero by reflecting the sign around the nonnegative core (trunc-vs-floor
    * division asymmetry on negatives never enters). den must still be > 0.
    */
  def ihalfUpSigned(num: Column, den: Column): Column =
    when(num >= 0, ihalfUp(num, den)).otherwise(-ihalfUp(-num, den))

  /** SQL fragment mirroring [[ihalfUpSigned]]. */
  def ihalfUpSignedSql(num: String, den: String): String =
    s"""CASE WHEN ($num) >= 0 THEN ${ihalfUpSql(num, den)}
       | ELSE -${ihalfUpSql(s"-($num)", den)} END""".stripMargin.replace("\n", " ")
}
