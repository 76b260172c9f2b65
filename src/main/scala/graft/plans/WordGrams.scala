package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-gram extraction: every window of k consecutive
  * space-tokens joined by `sep`, IN ORDER and WITH MULTIPLICITY, as one
  * `array<string>` — element-identical to the relational idiom it replaces
  * for inputs with at least k tokens:
  *
  *   transform(sequence(0, size(ws) - k),
  *     i -> concat(ws[i], sep, ws[i+1], ..., sep, ws[i+k-1]))
  *   -- ws = split(text, ' '); trailing empty tokens kept (limit -1)
  *
  * Unlike [[HashedShingles]] (distinct + hashed — the set-similarity /
  * MinHash surface) this keeps the literal gram STRINGS and their
  * multiplicity: the tf/df text statistics (sparse cosine, bigram LMs,
  * Kneser–Ney) group and join on the gram text, where replacing strings
  * with 32-bit hashes could merge distinct grams on a collision and
  * silently shift counts.
  *
  * Why native: the transform/sequence form is an interpreted lambda that
  * re-dispatches per position and builds each gram via single-element
  * concats; one pass with a StringBuilder emits the same array inside
  * whole-stage codegen. Inputs with fewer than k tokens yield NULL (the
  * sequence form DESCENDS there); callers keep their >= k guard.
  */
case class WordGrams(child: Expression, k: Int, sep: Char)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_grams needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[UTF8String], k, sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("wg")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.WordGrams.compute($c, $k, (char) ${sep.toInt});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {

  def apply(text: Column, k: Int, sep: Char): Column =
    GraftBridge.column(new WordGrams(GraftBridge.expression(text), k, sep))

  /** The per-row kernel; `null` when the text has fewer than k tokens.
    * Public and static so generated code calls it directly.
    */
  def compute(text: UTF8String, k: Int, sep: Char): ArrayData = {
    // Spark split semantics: limit -1 keeps trailing empty tokens
    val tokens = text.toString.split(" ", -1)
    val n = tokens.length - k + 1
    if (n < 1) return null
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(sep)
        sb.append(tokens(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
