package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: UTF-8 VALIDATION + REPAIR of a raw byte
  * column in one pass — the first thing a web-scale text-ingest
  * pipeline does to crawl bytes before any tokenizer sees them.
  * Returns `struct(repaired string, n_invalid int, n_chars int)`:
  * the decoded text with each MAXIMAL INVALID SUBPART replaced by one
  * U+FFFD (the Unicode/WHATWG recommended policy: a truncated lead
  * consumes its valid continuations and yields ONE replacement; the
  * byte that broke the sequence is re-examined as a new sequence
  * start), the number of replacements, and the decoded code-point
  * count. The validator enforces the full RFC 3629 table — overlong
  * encodings (C0/C1, E0 80-9F, F0 80-8F), UTF-16 surrogates
  * (ED A0-BF), and code points past U+10FFFF (F4 90+, F5-FF) are
  * invalid even when their continuation bytes look healthy.
  *
  * Scalar semantics (binary → struct), so an Expression is the right
  * altitude; `doGenCode` emits a static call (the StaticInvoke
  * pattern) so the whole-stage-codegen span stays unbroken around it.
  * Nulls propagate.
  */
case class Utf8Scrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("repaired", StringType, nullable = false),
    StructField("n_invalid", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"utf8_scrub needs a binary child, got ${child.dataType}")

  override def prettyName: String = "utf8_scrub"

  override def nullSafeEval(input: Any): Any =
    Utf8Scrub.scrub(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Utf8Scrub.scrub($c);")

  override protected def withNewChildInternal(newChild: Expression): Utf8Scrub =
    copy(child = newChild)
}

object Utf8Scrub {

  /** One-pass maximal-subpart decode (see the class doc). Public and
    * static so generated code can call it directly.
    */
  def scrub(b: Array[Byte]): InternalRow = {
    val n = b.length
    val sb = new java.lang.StringBuilder(n)
    var invalid = 0
    var chars = 0
    var i = 0
    def cont(at: Int, lo: Int, hi: Int): Boolean =
      at < n && (b(at) & 0xff) >= lo && (b(at) & 0xff) <= hi
    while (i < n) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) {
        sb.append(b0.toChar); chars += 1; i += 1
      } else if (b0 >= 0xc2 && b0 <= 0xdf) {
        if (cont(i + 1, 0x80, 0xbf)) {
          sb.appendCodePoint(((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f))
          chars += 1; i += 2
        } else { sb.append('\uFFFD'); invalid += 1; chars += 1; i += 1 }
      } else if (b0 >= 0xe0 && b0 <= 0xef) {
        // the first continuation's window shuts out overlongs (E0) and
        // surrogates (ED)
        val lo1 = if (b0 == 0xe0) 0xa0 else 0x80
        val hi1 = if (b0 == 0xed) 0x9f else 0xbf
        if (!cont(i + 1, lo1, hi1)) {
          sb.append('\uFFFD'); invalid += 1; chars += 1; i += 1
        } else if (!cont(i + 2, 0x80, 0xbf)) {
          // lead + one valid continuation = ONE maximal subpart
          sb.append('\uFFFD'); invalid += 1; chars += 1; i += 2
        } else {
          sb.appendCodePoint(((b0 & 0x0f) << 12) |
            ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f))
          chars += 1; i += 3
        }
      } else if (b0 >= 0xf0 && b0 <= 0xf4) {
        // the first continuation's window shuts out overlongs (F0) and
        // beyond-U+10FFFF (F4)
        val lo1 = if (b0 == 0xf0) 0x90 else 0x80
        val hi1 = if (b0 == 0xf4) 0x8f else 0xbf
        if (!cont(i + 1, lo1, hi1)) {
          sb.append('\uFFFD'); invalid += 1; chars += 1; i += 1
        } else if (!cont(i + 2, 0x80, 0xbf)) {
          sb.append('\uFFFD'); invalid += 1; chars += 1; i += 2
        } else if (!cont(i + 3, 0x80, 0xbf)) {
          sb.append('\uFFFD'); invalid += 1; chars += 1; i += 3
        } else {
          sb.appendCodePoint(((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f))
          chars += 1; i += 4
        }
      } else {
        // 0x80-0xC1 stray continuations / overlong leads, 0xF5-0xFF
        sb.append('\uFFFD'); invalid += 1; chars += 1; i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), invalid, chars))
  }

  /** Column-API entry point. */
  def apply(bytes: Column): Column =
    GraftBridge.column(Utf8Scrub(GraftBridge.expression(bytes)))
}
