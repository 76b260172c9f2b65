package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL length-`winLen` CHARACTER windows of a
  * string at stride 1, as one `array<string>` — byte-identical to
  * `transform(sequence(1, length(s) - winLen + 1), i -> substring(s, i, winLen))`
  * ONLY for inputs with length(s) >= winLen. Shorter inputs yield an
  * EMPTY array (the intended contract), while the sequence() form
  * DESCENDS for an upper bound <= 0 and emits bogus windows — callers
  * must keep the `length >= winLen` guard (Round4Queries2 does) if they
  * ever substitute one for the other.
  *
  * Why native: `substring(s, i, L)` re-scans the UTF8String from its
  * start to locate character i (code points are variable-width bytes), so
  * the compositional window extraction is O(n²) per document on top of
  * the interpreted lambda — the same accidental quadratic the winnowing
  * chain had ([[WinnowFingerprints]]). One pass records every code-point
  * boundary, then each window is a zero-copy byte slice between
  * boundaries i and i+L: O(n) scan + O(n·L) emitted bytes, inside
  * whole-stage codegen.
  *
  * This keeps q121's exact-substring semantics intact (its oracle md5s
  * the LITERAL window text, so [[RollingWindowHashes]] — the hash-only
  * O(n) route — cannot serve it). Nulls propagate; inputs shorter than
  * `winLen` chars yield an empty array.
  */
case class WindowSubstrings(child: Expression, winLen: Int)
    extends UnaryExpression {

  require(winLen >= 1, s"winLen must be >= 1, got $winLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"window_substrings needs a string child, got ${child.dataType}")

  override def prettyName: String = "window_substrings"

  override def nullSafeEval(input: Any): Any =
    WindowSubstrings.windows(input.asInstanceOf[UTF8String], winLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WindowSubstrings.windows($c, $winLen);")

  override protected def withNewChildInternal(newChild: Expression): WindowSubstrings =
    copy(child = newChild)
}

object WindowSubstrings {

  /** One boundary-recording pass, then zero-copy byte slices. Public and
    * static so generated code calls it directly.
    */
  def windows(s: UTF8String, winLen: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // code-point boundaries: starts(k) = byte offset of the k-th char
    val starts = new Array[Int](n + 1)
    var m = 0
    var i = 0
    while (i < n) {
      starts(m) = i
      m += 1
      val b0 = bytes(i) & 0xff
      i += (if (b0 < 0x80) 1
        else if ((b0 & 0xe0) == 0xc0) 2
        else if ((b0 & 0xf0) == 0xe0) 3
        else 4)
    }
    starts(m) = n
    val nw = m - winLen + 1
    if (nw <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nw)
    var k = 0
    while (k < nw) {
      out(k) = UTF8String.fromBytes(bytes, starts(k),
        starts(k + winLen) - starts(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, winLen: Int): Column =
    GraftBridge.column(WindowSubstrings(GraftBridge.expression(text), winLen))
}
