package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature vector: all
  * [[graft.functions.HashFunctions.MinhashParams]] family members evaluated
  * in ONE pass over a hashed-shingle `array<long>`, as `array<long>` of
  * length 8 — element i equal to
  *
  *   array_min(transform(hs, h -> pmod(a_i * h + b_i, Prime)))
  *
  * (null elements of `hs` are skipped exactly as `array_min` skips them; an
  * empty or all-null input yields all-null signature elements, matching
  * `array_min`'s null on empty).
  *
  * Why native: the relational form is EIGHT interpreted `transform` lambdas
  * per row, each materializing a boxed copy of the shingle array before its
  * `array_min` — 8 array allocations and ~8·|hs| boxed lambda dispatches
  * per document for what is arithmetically one running-min loop. The affine
  * arithmetic is exact: a, b < 2²⁰ and hash32 values < 2³² keep a·h+b < 2⁵²
  * (no overflow on the intended domain), and `Math.floorMod` IS `pmod` for
  * any sign of the dividend.
  *
  * Consumers extract elements with `getItem`; keep the extraction in a
  * SEPARATE projection from downstream consumers so CollapseProject's
  * duplicate-reference rule (non-cheap expressions referenced more than
  * once are never inlined) preserves the single evaluation.
  */
case class MinhashFamily(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_family"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_family needs an array<bigint> child, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashFamily.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinhashFamily.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinhashFamily =
    copy(child = newChild)
}

object MinhashFamily {

  def apply(hs: Column): Column =
    GraftBridge.column(new MinhashFamily(GraftBridge.expression(hs)))

  val Size: Int = graft.functions.HashFunctions.MinhashParams.size
  private val A: Array[Long] =
    graft.functions.HashFunctions.MinhashParams.map(_._1).toArray
  private val B: Array[Long] =
    graft.functions.HashFunctions.MinhashParams.map(_._2).toArray
  private val Prime: Long = graft.functions.HashFunctions.Prime

  /** One running-min loop over the hashes; null elements skipped. Public
    * and static so generated code calls it directly.
    */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = new Array[Long](Size)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val h = hs.getLong(i)
        var f = 0
        while (f < Size) {
          val v = java.lang.Math.floorMod(A(f) * h + B(f), Prime)
          if (v < mins(f)) mins(f) = v
          f += 1
        }
      }
      i += 1
    }
    if (!any) return new GenericArrayData(new Array[Any](Size)) // all null
    new GenericArrayData(mins)
  }
}
