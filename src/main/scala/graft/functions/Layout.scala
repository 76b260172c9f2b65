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

  import org.apache.spark.sql.DataFrame

  /** Hilbert curve distance for `order`-bit coordinates (the standard xy2d
    * bit walk with quadrant rotations). Hilbert keys have strictly better
    * locality than Morton: consecutive keys are always adjacent cells, so
    * sorted-write file spans are tighter still. The rotation state makes
    * this a per-level FOLD, not a bit-parallel formula — expressed as one
    * chained projection per level (linear plan, subexpressions named, no
    * exponential expression blow-up).
    *
    * Input columns `xCol`/`yCol` must hold non-negative ints below
    * 2^order; the key lands in `out`.
    */
  def withHilbert(df: DataFrame, order: Int, xCol: String, yCol: String,
                  out: String): DataFrame = {
    val hx = s"__h_x"
    val hy = s"__h_y"
    var cur = df.withColumn(hx, col(xCol).cast("long"))
      .withColumn(hy, col(yCol).cast("long"))
      .withColumn(out, lit(0L))
    (order - 1 to 0 by -1).foreach { level =>
      val s = 1L << level
      val rx = when(col(hx).bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col(hy).bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      cur = cur
        .withColumn("__rx", rx).withColumn("__ry", ry)
        .withColumn(out,
          col(out) + lit(s) * lit(s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate the quadrant: flip when rx==1, then swap axes (ry==0 only)
        .withColumn("__xa",
          when(col("__ry") === 0 && col("__rx") === 1, lit(s) - 1 - col(hx)).otherwise(col(hx)))
        .withColumn("__ya",
          when(col("__ry") === 0 && col("__rx") === 1, lit(s) - 1 - col(hy)).otherwise(col(hy)))
        .withColumn(hx, when(col("__ry") === 0, col("__ya")).otherwise(col("__xa")))
        .withColumn(hy, when(col("__ry") === 0, col("__xa")).otherwise(col("__ya")))
    }
    cur.drop(hx, hy, "__rx", "__ry", "__xa", "__ya")
  }

  /** DuckDB CTE chain mirroring [[withHilbert]]: `from` must expose columns
    * (x, y); the result CTE exposes (x0, y0, hd) where x0/y0 are the
    * original coordinates and hd the Hilbert distance.
    */
  def hilbertCtesSql(order: Int, from: String): (String, String) = {
    val init = s"h$order AS (SELECT x AS x0, y AS y0, CAST(x AS BIGINT) AS hx, CAST(y AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM $from)"
    val levels = (order - 1 to 0 by -1).map { level =>
      val s = 1L << level
      val prev = s"h${level + 1}"
      s"""h$level AS (
         |  SELECT x0, y0,
         |    CASE WHEN ry = 0 THEN ya ELSE xa END AS hx,
         |    CASE WHEN ry = 0 THEN xa ELSE ya END AS hy,
         |    hd + $s * $s * xor(3 * rx, ry) AS hd
         |  FROM (
         |    SELECT x0, y0, hx, hy, hd, rx, ry,
         |      CASE WHEN ry = 0 AND rx = 1 THEN $s - 1 - hx ELSE hx END AS xa,
         |      CASE WHEN ry = 0 AND rx = 1 THEN $s - 1 - hy ELSE hy END AS ya
         |    FROM (
         |      SELECT x0, y0, hx, hy, hd,
         |        CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |        CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |      FROM $prev)))""".stripMargin.replace("\n", " ")
    }
    ((init +: levels).mkString(",\n      "), "h0")
  }

  /** Reference JVM implementation for property tests (same bit walk). */
  def hilbertRef(order: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0.toLong, y0.toLong, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
