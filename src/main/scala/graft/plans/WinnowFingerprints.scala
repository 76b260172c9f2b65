package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the complete MOSS-winnowing fingerprint
  * set of a string — sorted distinct minima of every `window`-wide run of
  * 5-char-gram polynomial hashes — in ONE O(n) pass per row.
  *
  * Semantics are EXACTLY the compositional chain it replaces (and the
  * DuckDB oracle reproduces):
  *
  *   gh(i)  = ascii(substr(s,i,1))·923521 + ascii(substr(s,i+1,1))·29791
  *          + ascii(substr(s,i+2,1))·961 + ascii(substr(s,i+3,1))·31
  *          + ascii(substr(s,i+4,1)),   i = 1 .. numChars−4
  *   fps    = sort_array(array_distinct(min over each window of gh))
  *
  * `ascii`/`substr` count CODE POINTS on both engines (Spark's ascii('€')
  * = 8364 = DuckDB's), so the walk decodes full code points from the
  * UTF-8 bytes — equivalent on any data, not just ASCII.
  *
  * Why native: the compositional form is TWO nested higher-order
  * functions (always interpreted), and its per-position
  * `ascii(substr(s, i, 1))` re-scans the UTF8String from the start on
  * every call (substring is O(i) over variable-width bytes) — O(n²·w)
  * per document. Worse, any projection split that tries to stage the
  * char-code array is at the mercy of projection collapse: the r15
  * rework measured the staged array getting re-inlined into the
  * consuming lambda in some plan contexts (bench q57 >300 s/task while
  * an adjacent consumer shape ran in seconds). One opaque expression
  * removes the altitude problem entirely: code-point decode, gram
  * polynomial, monotonic-deque window minima, sort + dedup — all inside
  * the consuming codegen stage, O(n log n) worst case (the sort),
  * allocation ≤ 3 arrays per row. Nulls propagate; inputs shorter than
  * `4 + window` chars yield an empty array.
  */
case class WinnowFingerprints(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs a string child, got ${child.dataType}")

  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fps(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowFingerprints.fps($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** The whole winnowing pass. Public and static so generated code calls
    * it directly.
    */
  def fps(s: UTF8String, window: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // decode UTF-8 to code points (both engines' ascii(substr(s,i,1)))
    val cps = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { len = 2; cp = b0 & 0x1f }
        else if ((b0 & 0xf0) == 0xe0) { len = 3; cp = b0 & 0x0f }
        else { len = 4; cp = b0 & 0x07 }
        var k = 1
        while (k < len && i + k < n) { cp = (cp << 6) | (bytes(i + k) & 0x3f); k += 1 }
      }
      cps(m) = cp
      m += 1
      i += len
    }
    val ng = m - 4 // gram count
    val nw = ng - window + 1 // window count
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)
    val gh = new Array[Long](ng)
    var j = 0
    while (j < ng) {
      gh(j) = cps(j) * 923521L + cps(j + 1) * 29791L + cps(j + 2) * 961L +
        cps(j + 3) * 31L + cps(j + 4)
      j += 1
    }
    // monotonic-deque sliding minima
    val out = new Array[Long](nw)
    val idx = new Array[Int](ng)
    var head = 0
    var tail = 0
    j = 0
    while (j < ng) {
      val v = gh(j)
      while (tail > head && gh(idx(tail - 1)) >= v) tail -= 1
      idx(tail) = j
      tail += 1
      if (idx(head) <= j - window) head += 1
      if (j >= window - 1) out(j - window + 1) = gh(idx(head))
      j += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var k = 0
    while (k < nw) {
      if (w == 0 || out(k) != out(w - 1)) { out(w) = out(k); w += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Column-API entry point. */
  def apply(text: Column, window: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text), window))
}
