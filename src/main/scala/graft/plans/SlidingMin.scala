package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the minima of ALL length-`window` sliding
  * windows of an `array<long>`, as one `array<long>` (length
  * `n - window + 1`; empty when the input is shorter than the window).
  *
  * This is the winnowing hot loop ([[graft.operators.Dedup.winnowFingerprints]]).
  * The compositional route —
  * `transform(sequence(1, n-w+1), i -> array_min(slice(gh, i, w)))` —
  * evaluates INTERPRETED (higher-order functions never enter whole-stage
  * codegen) and touches O(n·w) elements through per-element virtual
  * dispatch. The monotonic-deque recurrence touches each element O(1)
  * times amortized — O(n) total — and `doGenCode` keeps the loop inside
  * the consuming stage. Output VALUES are identical to the per-window
  * `array_min` (the deque keeps the window minimum regardless of tie
  * position), so the DuckDB oracle and the pre-r15 plan reproduce it
  * exactly.
  *
  * Contract: elements must be NON-NULL (winnowing gram hashes are, by
  * construction — each is arithmetic over `ascii()` of in-range
  * positions). A null element throws rather than silently diverging
  * from `array_min`'s null-skipping. Null ARRAYS propagate.
  */
case class SlidingMin(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sliding_min needs an array<bigint> child, got $other")
    }

  override def prettyName: String = "sliding_min"

  override def nullSafeEval(input: Any): Any =
    SlidingMin.minima(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SlidingMin.minima($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object SlidingMin {

  /** Monotonic-deque sliding minima. Public and static so generated code
    * calls it directly (one call per row — the loop itself does not need
    * to inline to keep the stage fused).
    */
  def minima(a: ArrayData, window: Int): ArrayData = {
    val n = a.numElements()
    val m = n - window + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val idx = new Array[Int](n) // deque of candidate indices, values increasing
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"sliding_min: null element at $i (winnowing grams are non-null by construction)")
      val v = a.getLong(i)
      while (tail > head && a.getLong(idx(tail - 1)) >= v) tail -= 1
      idx(tail) = i
      tail += 1
      if (idx(head) <= i - window) head += 1
      if (i >= window - 1) out(i - window + 1) = a.getLong(idx(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(arr: Column, window: Int): Column =
    GraftBridge.column(SlidingMin(GraftBridge.expression(arr), window))
}
