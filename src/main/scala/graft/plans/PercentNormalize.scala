package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: PERCENT-ENCODING NORMALIZATION (RFC
  * 3986 §6.2.2) — the missing half of URL canonicalization for dedup:
  * `http://ex.org/%7Euser` and `http://ex.org/~user` are the SAME
  * resource, as are `%3f` and `%3F`. Escapes of UNRESERVED characters
  * (ALPHA / DIGIT / `-` `.` `_` `~`) decode to the character; every
  * other valid escape keeps its `%` form with the hex digits
  * UPPERCASED (decoding reserved characters would change the URL's
  * structure); a `%` not followed by two hex digits passes through
  * literally (the lenient browser behavior — rejecting would drop
  * real-world URLs wholesale). Composes with
  * [[graft.operators.TextAnalysis.canonicalizeUrl]] as the
  * normalization step before the case/port/utm folds.
  *
  * Scalar string→string semantics via the static-call codegen pattern;
  * nulls propagate.
  */
case class PercentNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"percent_normalize needs a string child, got ${child.dataType}")

  override def prettyName: String = "percent_normalize"

  override def nullSafeEval(input: Any): Any =
    PercentNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PercentNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}

object PercentNormalize {

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def unreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  /** Public and static so generated code can call it directly. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (!str.contains('%')) return s
    val out = new StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '%' && i + 2 < str.length &&
        hex(str.charAt(i + 1)) >= 0 && hex(str.charAt(i + 2)) >= 0) {
        val b = (hex(str.charAt(i + 1)) << 4) | hex(str.charAt(i + 2))
        if (unreserved(b)) out.append(b.toChar)
        else out.append('%')
          .append(java.lang.Character.toUpperCase(str.charAt(i + 1)))
          .append(java.lang.Character.toUpperCase(str.charAt(i + 2)))
        i += 3
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  /** Column-API entry point. */
  def apply(url: Column): Column =
    GraftBridge.column(PercentNormalize(GraftBridge.expression(url)))
}
