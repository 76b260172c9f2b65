package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL Rabin–Karp rolling hashes of a string's
  * length-`window` byte windows at stride 1, as one `array<long>`.
  *
  * This is the scale path for char-level exact-substring detection
  * (q121's semantics): the compositional route materializes every window as
  * a substring and md5-digests it — O(n·L) bytes touched and one digest per
  * window — while the rolling recurrence touches each byte twice:
  *
  *   h(i+1) = (h(i) − s[i]·B^(L−1)) · B + s[i+L]   (wrapping 64-bit, B=1000003)
  *
  * Per the build plan's preference order the semantics are scalar
  * (string → array), so an Expression is the right altitude, and
  * `doGenCode` keeps the loop inside whole-stage codegen next to the
  * explode that consumes it. 64-bit wraparound collisions are ~2⁻⁶⁴ per
  * pair — fine for dedup candidate generation (an exact-verify pass can
  * follow, as in the bloom/LSH operators); NOT oracle-reproducible, so the
  * oracle-checked q121 keeps the md5 form and this expression is the
  * bench/corpus-scale variant (same pattern as q19 broadcast vs q20
  * bucketed: one semantics, two physical routes).
  *
  * Operates on the UTF-8 BYTES of the string (windows are byte windows; on
  * ASCII corpora byte and char windows coincide). Returns an empty array
  * when the input is shorter than `window`. Nulls propagate.
  */
case class RollingWindowHashes(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_window_hashes needs a string child, got ${child.dataType}")

  override def prettyName: String = "rolling_window_hashes"

  /** B^(L−1) with 64-bit wraparound, precomputed once per expression. */
  private lazy val bPow: Long = {
    var p = 1L
    var i = 1
    while (i < window) { p *= RollingWindowHashes.Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var i = 0
    while (i < window) { h = h * RollingWindowHashes.Base + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    i = window
    while (i < n) {
      h = (h - (bytes(i - window) & 0xffL) * bPow) * RollingWindowHashes.Base +
        (bytes(i) & 0xffL)
      out(i - window + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val base = RollingWindowHashes.Base
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |if ($n < $window) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $window + 1];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $window; $i++) {
         |    $h = $h * ${base}L + ($bytes[$i] & 0xffL);
         |  }
         |  $out[0] = $h;
         |  for (int $i = $window; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $window] & 0xffL) * ${bPow}L) * ${base}L
         |        + ($bytes[$i] & 0xffL);
         |    $out[$i - $window + 1] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

object RollingWindowHashes {

  /** Polynomial base — odd, > 2⁸, so byte values spread across the word. */
  val Base: Long = 1000003L

  /** Column-API entry point. */
  def apply(text: Column, window: Int): Column =
    GraftBridge.column(RollingWindowHashes(GraftBridge.expression(text), window))
}
