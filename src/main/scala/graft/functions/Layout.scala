package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for 100 TB pruning: writing a table sorted (or
  * range-partitioned) by a space-filling-curve key clusters rows in EVERY
  * interleaved dimension at once, so parquet min/max stats prune
  * multi-column range predicates that a single-column sort cannot.
  * Pure bit arithmetic — engine-portable, codegen'd, no UDFs.
  */
object Layout {

  /** Z-order (Morton) key: interleaves the low 16 bits of two non-negative
    * int columns — x occupies even bits, y odd bits.
    */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      shiftright(x.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** SQL fragment mirroring [[zorder16]] for oracle text. */
  def zorder16Sql(x: String, y: String): String =
    (0 until 16).map { b =>
      s"((($x) >> $b) & 1) * ${1L << (2 * b)} + ((($y) >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString("(", " + ", ")")

  /** Reference JVM implementation for property tests. */
  def zorder16Ref(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }
}
