package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Det
import graft.operators.Ranks

/** Pins the integer-exact rounding helpers: [[Det.ihalfUp]] must equal
  * round-half-up of the true rational at any magnitude (including sums far
  * beyond int64, where a DECIMAL→DOUBLE detour would go non-portable), and
  * the signed variant must be a clean sign reflection. Also pins the
  * lower-median selection convention (rank (n+1) div 2 under
  * [[Ranks.selectByRank]]) to DuckDB's quantile_disc(0.5) semantics that the
  * q176 oracle relies on.
  */
class DetSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def refHalfUp(num: BigInt, den: BigInt): Long =
    ((2 * num + den) / (2 * den)).toLong // exact: floor(num/den + 1/2)

  test("ihalfUp equals rational round-half-up on random long operands incl. exact ties") {
    val cases = Seq.fill(300)((rnd.nextLong().abs % 1000000000L, rnd.nextLong().abs % 9999 + 1)) ++
      Seq((5L, 10L), (15L, 10L), (25L, 10L), (1L, 2L), (3L, 2L), (0L, 7L)) // .5 ties round UP
    val df = cases.toDF("n", "d")
      .select(col("n"), col("d"), Det.ihalfUp(col("n"), col("d")).as("r"))
      .collect()
    cases.zip(df).foreach { case ((n, d), row) =>
      assert(row.getLong(2) == refHalfUp(n, d), s"ihalfUp($n, $d)")
    }
  }

  test("ihalfUp stays exact on DECIMAL(38,0) operands beyond int64 and 2^53") {
    // sums like the q171 Brier accumulator: ~1e25 numerators
    val num = BigInt("12345678901234567890123457")
    val den = BigInt("23456789012345678")
    val out = Seq((num.toString, den.toString)).toDF("n", "d")
      .select(Det.ihalfUp(
        col("n").cast(DecimalType(38, 0)), col("d").cast(DecimalType(38, 0))).as("r"))
      .head().getLong(0)
    assert(out == refHalfUp(num, den))
  }

  test("ihalfUpSigned reflects the sign and rounds half away from zero") {
    val cases = Seq((7L, 2L), (-7L, 2L), (5L, 10L), (-5L, 10L), (-15L, 10L), (0L, 3L))
    val out = cases.toDF("n", "d")
      .select(Det.ihalfUpSigned(col("n"), col("d")).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(4L, -4L, 1L, -1L, -2L, 0L))
  }

  test("selectByRank at rank (n+1) div 2 is the lower median (quantile_disc convention)") {
    val lowerMedian = (n: org.apache.spark.sql.Column) => ((n + lit(1L)) / 2).cast("long")
    // even group: {10,20,30,40} -> 20; odd group: {1,2,3,4,5} -> 3; ties: {7,7,8,9} -> 7
    val df = Seq(("e", 10L), ("e", 20L), ("e", 30L), ("e", 40L),
      ("o", 1L), ("o", 2L), ("o", 3L), ("o", 4L), ("o", 5L),
      ("t", 7L), ("t", 7L), ("t", 8L), ("t", 9L))
      .toDF("g", "x").withColumn("id", monotonically_increasing_id())
    val med = Ranks.selectByRank(df, Seq(col("g")), Seq(col("x"), col("id")),
        lowerMedian, "r")
      .select("g", "x").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(med == Map("e" -> 20L, "o" -> 3L, "t" -> 7L))
  }
}
