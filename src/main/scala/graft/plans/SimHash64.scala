package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a document's distinct word `k`-shingles, as ONE
  * per-row pass — bit-identical to the relational chain it replaces
  * (`operators.Dedup.simhash64Table`'s explode(wordShingles) →
  * groupBy(doc_id) → 63 signed bit-count sums → pack):
  *
  *   - tokens = split(text, " ") with trailing empties KEPT (Spark's
  *     `split` limit -1 semantics; Java's default split(regex) drops them)
  *   - shingles = DISTINCT windows of k consecutive tokens joined by " "
  *     (array_distinct semantics: each distinct shingle votes once)
  *   - per shingle, h_lo/h_hi = the first/second 8-hex-char windows of ONE
  *     md5 digest parsed base-16 ([[graft.functions.HashFunctions.hash32At]]
  *     positions 1 and 9)
  *   - bit b of the signature is set iff the +1/−1 vote sum over shingles
  *     of h_lo's bit b (b < 32) / h_hi's bit b−32 (32 ≤ b < 63) is > 0;
  *     bit 63 is never set
  *
  * Why native: the relational form pays a generator row per shingle and a
  * full shuffle + 63-column hash aggregate per SIGNATURE — the signature
  * of a document is a pure per-row function, so at scale this is an
  * exchange that should not exist. As one expression the signature stage
  * of every sim64 consumer (banded pairs, cross-modal text leg, the
  * persisted sim64 index) becomes map-only, and a STREAMING feed can
  * compute it as a stateless projection (an explode+groupBy is a stateful
  * streaming aggregation, which made the relational form unusable in a
  * stream).
  *
  * Inputs with fewer than k tokens yield NULL (the relational chain
  * excludes them by filter; callers keep that filter).
  */
case class SimHash64(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sim")
      s"""
         |java.lang.Long $r = graft.plans.SimHash64.compute($c, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  def apply(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      new SimHash64(org.apache.spark.sql.GraftBridge.expression(text), k))

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The per-row kernel; `null` when the text has fewer than k tokens.
    * The h_lo/h_hi byte arithmetic is exactly
    * `conv(substring(md5(x), 1|9, 8), 16, 10)` without the hex round-trip.
    */
  def compute(text: UTF8String, k: Int): java.lang.Long = {
    // Spark split semantics: limit -1 keeps trailing empty tokens
    val tokens = text.toString.split(" ", -1)
    val n = tokens.length - k + 1
    if (n < 1) return null
    val seen = new java.util.HashSet[String](math.max(8, n * 2))
    val votes = new Array[Int](63)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        digest.reset()
        val d = digest.digest(shingle.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        // hash32At(sh, 1) = hex chars [0,8) = bytes 0..3 big-endian;
        // hash32At(sh, 9) = hex chars [8,16) = bytes 4..7
        val hLo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val hHi = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((hLo >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        b = 0
        while (b < 31) {
          votes(32 + b) += (if (((hHi >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
