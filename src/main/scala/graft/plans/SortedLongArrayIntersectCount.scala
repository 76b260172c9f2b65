package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: the size of the intersection of two SORTED,
  * DISTINCT `array<long>` columns, via a linear merge.
  *
  * This is the hot inner loop of exact near-dup verification (Jaccard over
  * hashed shingle sets, evaluated per candidate pair). The built-in
  * `array_intersect` allocates and populates a hash set per row-pair; the
  * merge needs no allocation and no hashing, and `doGenCode` keeps it inside
  * whole-stage codegen. Preference order per the build plan: compose
  * built-ins < custom Expression (this) < custom physical operator — the
  * semantics are scalar, so an Expression is the right altitude.
  *
  * Inputs MUST be ascending-sorted and duplicate-free (produce them with
  * `sort_array(array_distinct(...))`); behavior on unsorted input is
  * undefined. Nulls propagate.
  */
case class SortedLongArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    val xn = x.numElements()
    val yn = y.numElements()
    while (i < xn && j < yn) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongArrayIntersectCount {

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongArrayIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
