package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row hashed word-`k`-shingle set: the SORTED DISTINCT hash32
  * values of a document's word k-grams, as one `array<long>` — equal (as a
  * sorted set) to the relational chain it replaces for inputs with at least
  * k tokens:
  *
  *   sort_array(array_distinct(transform(
  *     array_distinct(transform(sequence(1, size(ts) - k + 1),
  *       i -> concat_ws(sep, slice(ts, i, k)))),       -- ts = split(text,' ')
  *     t -> conv(substring(md5(t), 1, 8), 16, 10) :: long)))
  *
  * Semantics pinned by ExpressionSpec's equivalence test:
  *   - tokens = split(text, " ") with trailing empties KEPT (Spark's limit
  *     -1 semantics — [[SimHash64]] established the convention);
  *   - shingles join k consecutive tokens with `sep` (space for the dedup
  *     shingle surface, '_' for the set-similarity trigram surface);
  *   - hash32 = the first 8 hex chars of the shingle's md5 parsed base 16 —
  *     computed here as the first 4 digest bytes big-endian, skipping the
  *     hex round-trip ([[graft.functions.HashFunctions.hash32]]);
  *   - distinct-by-string then distinct-by-hash collapses to one distinct
  *     over hash values (equal strings hash equal), sorted ascending.
  *
  * Inputs with fewer than k tokens yield NULL — the relational chain's
  * `sequence(1, n<1)` DESCENDS there (and `slice(ts, 0, k)` throws), so
  * callers already guard with `filter(size(split(text,' ')) >= k)` and must
  * keep that guard.
  *
  * Why native: the chain above is two INTERPRETED higher-order lambdas plus
  * a per-shingle UTF8String concat, an md5 HEX-STRING materialization, a
  * substring and a base-16 string parse — per shingle, per document. One
  * pass over the tokens computes the same sorted set with a single
  * StringBuilder, raw digest bytes and a primitive sort: the map stage of
  * every MinHash/LSH/set-similarity consumer (signatures, banded index
  * builds, exact-verify shingle tables, source-overlap explodes) drops the
  * interpreter and the string churn, and — because the output is already
  * per-doc distinct — exploding it yields distinct (doc, h) rows WITHOUT
  * the row-level `.distinct()` exchange the gram-explode form needed.
  */
case class HashedShingles(child: Expression, k: Int, sep: Char)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_shingles needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], k, sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("hs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.HashedShingles.compute($c, $k, (char) ${sep.toInt});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {

  def apply(text: Column, k: Int, sep: Char = ' '): Column =
    GraftBridge.column(new HashedShingles(GraftBridge.expression(text), k, sep))

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The per-row kernel; `null` when the text has fewer than k tokens.
    * Public and static so generated code calls it directly.
    */
  def compute(text: UTF8String, k: Int, sep: Char): ArrayData = {
    // Spark split semantics: limit -1 keeps trailing empty tokens
    val tokens = text.toString.split(" ", -1)
    val n = tokens.length - k + 1
    if (n < 1) return null
    val digest = md5.get()
    val hs = new Array[Long](n)
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
      digest.reset()
      val d = digest.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // hash32 = hex chars [0,8) of md5 = digest bytes 0..3 big-endian
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var p = 0
    while (p < n) {
      if (m == 0 || hs(p) != hs(m - 1)) { hs(m) = hs(p); m += 1 }
      p += 1
    }
    new GenericArrayData(
      if (m == n) hs else java.util.Arrays.copyOf(hs, m))
  }
}
