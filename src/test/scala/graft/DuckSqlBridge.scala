package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._

/** DuckDB→Spark dialect bridge for the SQL front door sweep
  * (`SqlFrontDoorSpec`): the oracle texts are written in DuckDB's
  * dialect, but most of their CONSTRUCTS have exact Spark equivalents —
  * this object supplies them, so the sweep can prove the SQL surface and
  * the DataFrame surface compute the same rows over most of the query
  * surface instead of the ANSI-only slice.
  *
  * Two mechanisms:
  *
  *  - [[registerCompat]] registers DuckDB-named FUNCTIONS on the session
  *    as native Catalyst expressions (`list_transform` → ArrayTransform,
  *    `epoch_us` → UnixMicros, …) — no text munging, the parser already
  *    handles lambda arguments generically.
  *  - [[translate]] rewrites the few constructs that are SYNTAX, not
  *    functions: `::TYPE` casts, `//` integer division, 1-based list
  *    indexing/slicing `x[i]` / `x[a:b]`, `[…]` list literals, the
  *    md5-hex idiom, and `unnest(...) AS a(c)` lateral joins.
  *
  * Every rule is exact on its idiom's domain (notes inline); anything a
  * rule cannot make equivalent stays behind `SqlFrontDoorSpec`'s named
  * exclusion list with a reason.
  */
/** DuckDB `len()` accepts strings AND lists; Spark's is string-only.
  * Resolves to `size` for array/map children, `length` otherwise, at
  * analysis time (the child's type is known when ReplaceExpressions
  * runs).
  */
case class LenCompat(child: Expression) extends RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: org.apache.spark.sql.types.ArrayType |
         _: org.apache.spark.sql.types.MapType =>
      Size(child, legacySizeOfNull = false)
    case _ => Length(child)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DuckDB `json_type(json, path)` — the TYPED introspection
  * `get_json_object` cannot express (it returns unquoted text, erasing
  * the number/string distinction). Jackson-parses the document and
  * classifies the node at a `$.a.b` dot path with DuckDB's type names
  * (BIGINT/UBIGINT/DOUBLE/VARCHAR/BOOLEAN/NULL/ARRAY/OBJECT); NULL for a
  * missing path or unparseable document. Interpreted eval only — this
  * runs in the test-scope sweep, never in a production plan.
  */
case class JsonTypeCompat(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "json_type"
  override def nullSafeEval(json: Any, path: Any): Any = {
    val p = path.toString
    if (!p.startsWith("$")) return null
    // quoted keys ('$."a.b"') are not resolved here — fail LOUDLY instead
    // of returning a NULL that would surface as a confusing oracle
    // mismatch far from the cause (array [n] segments ARE supported below)
    if (p.contains('"'))
      throw new IllegalArgumentException(
        s"json_type compat does not resolve quoted path keys: $p")
    try {
      var node = JsonTypeCompat.mapper.readTree(json.toString)
      p.drop(1).split("\\.").filter(_.nonEmpty).foreach { seg =>
        if (node != null) {
          // each dot segment is a bare field name followed by zero or
          // more [n] array indices, matching DuckDB's resolution
          val m = JsonTypeCompat.segPat.findFirstMatchIn(seg).getOrElse(
            throw new IllegalArgumentException(
              s"json_type compat cannot parse path segment '$seg' in $p"))
          if (m.group(1).nonEmpty) node = node.get(m.group(1))
          JsonTypeCompat.idxPat.findAllMatchIn(m.group(2)).foreach { ix =>
            if (node != null) node = node.get(ix.group(1).toInt)
          }
        }
      }
      if (node == null) null
      else org.apache.spark.unsafe.types.UTF8String.fromString {
        if (node.isIntegralNumber)
          if (node.canConvertToLong) "BIGINT" else "UBIGINT"
        else if (node.isFloatingPointNumber) "DOUBLE"
        else if (node.isTextual) "VARCHAR"
        else if (node.isBoolean) "BOOLEAN"
        else if (node.isNull) "NULL"
        else if (node.isArray) "ARRAY"
        else "OBJECT"
      }
    } catch {
      // unsupported-path errors must escape (fail loudly, per contract
      // above); only malformed DOCUMENTS degrade to NULL like DuckDB's
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(_) => null
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object JsonTypeCompat {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val segPat = "^([^\\[\\]]*)((?:\\[\\d+\\])*)$".r
  private val idxPat = "\\[(\\d+)\\]".r
}

/** DuckDB `chr()` takes a UNICODE CODE POINT (chr(233) = 'é',
  * chr(65533) = U+FFFD); Spark's `chr` is ASCII-with-wraparound
  * (chr(n % 256)) — the two agree only below 128. Registered as
  * `duck_chr` (the bridge renames call sites). Interpreted eval only —
  * this runs in the test-scope sweep, never in a production plan.
  */
case class CodePointChr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "duck_chr"
  override def nullSafeEval(input: Any): Any = {
    val cp = input match {
      case l: Long => l.toInt
      case i: Int => i
      case other => other.toString.toInt
    }
    org.apache.spark.unsafe.types.UTF8String
      .fromString(new String(Character.toChars(cp)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DuckDB's SUM over INTEGER-typed expressions widens to HUGEINT (int128),
  * so its oracle arithmetic never overflows; Spark's SUM keeps BIGINT and
  * wraps (or, under ANSI, throws) past 2^63. `duck_sum` (the bridge
  * renames every `sum(` call site) reproduces the widening exactly on its
  * exact domain: an INTEGRAL child is cast to DECIMAL(38,0) before the
  * native Sum — exact to 10^38, far above any moment this surface
  * accumulates — while FLOAT/DOUBLE/DECIMAL children pass through
  * untouched (casting a double to scale-0 decimal would destroy it). The
  * dispatch happens at analysis time off the resolved child type, which
  * is why this is an expression and not a text rewrite.
  */
case class WidenIntegralSum(child: Expression) extends RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType =>
      Cast(child, org.apache.spark.sql.types.DecimalType(38, 0))
    case _ => child
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The oracle texts' dot product — DuckDB
  * `list_reduce(list_transform(generate_series(1, n), i -> a[i]::DOUBLE *
  * b[i]::DOUBLE), (x, y) -> x + y)` — as one direct loop. The HOF chain is
  * CORRECT in Spark but catastrophically slow: every per-row eval
  * materializes the series array and the transformed array and dispatches
  * an interpreted lambda per element, and the within-cluster pair scans
  * (q348's `dom`) evaluate it millions of times (measured: a 293 s task
  * that this expression finishes in ~2 s). Semantics preserved exactly:
  * sequential left-to-right double accumulation, floats widened before the
  * multiply, NULL when either array is NULL, shorter than n, or has a NULL
  * element in the first n (a[i] out of range / NULL poisons DuckDB's sum).
  */
case class BoundedVectorDot(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "duck_dot"
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any, b: Any, nv: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = nv.asInstanceOf[Number].intValue()
    if (x.numElements() < n || y.numElements() < n) return null
    val lf = isFloat(first)
    val rf = isFloat(second)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DuckSqlBridge {

  // ---------------- function aliases (parser-level equivalents) --------

  def registerCompat(spark: SparkSession): Unit = {
    def reg(name: String)(builder: Seq[Expression] => Expression): Unit =
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        new ExpressionInfo("graft.duckcompat", name), builder)
    def lam(f: Seq[Expression]): LambdaFunction = f.head match {
      case l: LambdaFunction => l
      case other => throw new IllegalArgumentException(s"expected lambda, got $other")
    }
    val emptyLongArray: Expression = // array<bigint> of size 0
      Slice(Sequence(Literal(0L), Literal(0L), None), Literal(1), Literal(0))
    reg("epoch_us")(a => UnixMicros(a.head))
    // HUGEINT-widening SUM (see WidenIntegralSum): the analyzer wraps the
    // returned AggregateFunction in an AggregateExpression itself, so
    // DISTINCT / FILTER / OVER forms all keep working
    reg("duck_sum")(a =>
      org.apache.spark.sql.catalyst.expressions.aggregate.Sum(
        WidenIntegralSum(a.head)))
    // the oracle dot-product idiom as a direct loop (see BoundedVectorDot)
    reg("duck_dot")(a => BoundedVectorDot(a(0), a(1), a(2)))
    reg("xor")(a => BitwiseXor(a(0), a(1)))
    reg("list_transform")(a => ArrayTransform(a(0), lam(a.tail)))
    reg("list_filter")(a => ArrayFilter(a(0), lam(a.tail)))
    reg("list_min")(a => ArrayMin(a.head))
    reg("list_max")(a => ArrayMax(a.head))
    reg("list_distinct")(a => ArrayDistinct(a.head))
    reg("list_intersect")(a => ArrayIntersect(a(0), a(1)))
    reg("list_contains")(a => ArrayContains(a(0), a(1)))
    reg("list_concat")(a => Concat(a))
    reg("list_append")(a => ArrayAppend(a(0), a(1)))
    // DuckDB arg order is (elem, list); Spark's is (list, elem)
    reg("list_prepend")(a => ArrayPrepend(a(1), a(0)))
    // left fold with 0::BIGINT init — integral lists sum to BIGINT like
    // DuckDB's list_sum; double lists coerce the accumulator to DOUBLE,
    // matching DuckDB's double sum (same left-to-right order)
    reg("list_sum") { a =>
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("fin"))
      ArrayAggregate(a.head, Literal(0L),
        LambdaFunction(Add(acc, x), Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }
    // DuckDB list_reduce seeds the fold with the FIRST element
    reg("list_reduce") { a =>
      val f = lam(a.tail)
      val fin = UnresolvedNamedLambdaVariable(Seq("fin"))
      ArrayAggregate(
        Slice(a.head, Literal(2), Subtract(Size(a.head), Literal(1))),
        ElementAt(a.head, Literal(1)), f,
        LambdaFunction(fin, Seq(fin)))
    }
    // DuckDB string_split (alias str_split) splits on a LITERAL
    // delimiter; Spark's split takes a regex — quote literal delimiters
    // at build time. Both keep trailing empty strings (Spark limit -1).
    val splitBuilder: Seq[Expression] => Expression = { a =>
      a(1) match {
        // empty delimiter = split to characters; Java's negative limit
        // would keep one trailing "" that DuckDB does not produce, so
        // use limit 0 (chars are never empty, nothing real is dropped)
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, _)
          if u.toString.isEmpty =>
          StringSplit(a(0), Literal(""), Literal(0))
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
          StringSplit(a(0),
            Literal(java.util.regex.Pattern.quote(u.toString)), Literal(-1))
        case other => StringSplit(a(0), other, Literal(-1))
      }
    }
    reg("string_split")(splitBuilder)
    reg("str_split")(splitBuilder)
    reg("array_to_string")(a => ArrayJoin(a(0), a(1), None))
    reg("json_extract_string")(a => GetJsonObject(a(0), a(1)))
    reg("json_keys")(a => JsonObjectKeys(a.head))
    reg("epoch")(a => UnixSeconds(a.head))
    // DuckDB len() covers strings AND lists; Spark's is string-only
    reg("duck_len")(a => LenCompat(a.head))
    // list_aggregate(l, 'name'): the dispatched names this surface uses
    reg("list_aggregate") { a =>
      val fn = a(1) match {
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
          u.toString
        case other =>
          throw new IllegalArgumentException(s"list_aggregate name: $other")
      }
      fn match {
        case "min" => ArrayMin(a.head)
        case "max" => ArrayMax(a.head)
        case "sum" =>
          val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
          val x = UnresolvedNamedLambdaVariable(Seq("x"))
          val fin = UnresolvedNamedLambdaVariable(Seq("fin"))
          ArrayAggregate(a.head, Literal(0L),
            LambdaFunction(Add(acc, x), Seq(acc, x)),
            LambdaFunction(fin, Seq(fin)))
        // string_agg over a LIST of strings = join with the separator
        // (DuckDB's default separator is ','); null elements are skipped
        // by both engines' string_agg/array_join-with-null-replacement
        // semantics only when told to — this surface passes non-null
        // string lists, where plain array_join is exact
        case "string_agg" =>
          ArrayJoin(a.head, if (a.length > 2) a(2) else Literal(","), None)
        case other =>
          throw new IllegalArgumentException(s"list_aggregate('$other')")
      }
    }
    // DuckDB chr() is a Unicode code point; Spark chr() wraps at 256
    reg("duck_chr")(a => CodePointChr(a.head))
    // DuckDB dayofweek is 0=Sunday..6=Saturday; Spark's is 1=Sunday..7
    reg("duck_dayofweek")(a => Subtract(DayOfWeek(a.head), Literal(1)))
    // Unicode NFC normalization — the repo's own codegen'd expression
    // registered under DuckDB's name (Spark ships no builtin)
    reg("nfc_normalize")(a => graft.plans.NfcNormalize(a.head))
    // DuckDB's typed JSON introspection (get_json_object erases types)
    reg("json_type")(a => JsonTypeCompat(a(0), a(1)))
    // exact linearly-interpolated percentile on both engines
    reg("quantile_cont")(a =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.Percentile(
        a(0), a(1)))
    reg("list_sort")(a => new SortArray(a.head))
    // DuckDB list_slice bounds are BOTH inclusive, 1-based
    reg("list_slice")(a => Slice(a(0),
      Cast(a(1), org.apache.spark.sql.types.IntegerType),
      Cast(Add(Subtract(a(2), a(1)), Literal(1)),
        org.apache.spark.sql.types.IntegerType)))
    // DuckDB returns NULL when absent; Spark's array_position returns 0
    reg("list_position")(a =>
      new NullIf(ArrayPosition(a(0), a(1)), Literal(0L)))
    // DuckDB range(n) = [0, n) and range(a, b) = [a, b): EXCLUSIVE upper
    // bound, empty when it does not exceed the lower — Spark's Sequence
    // is inclusive and turns descending instead of empty, hence the guard
    reg("range") {
      case Seq(n) =>
        If(GreaterThan(n, Literal(0L)),
          Sequence(Literal(0L), Subtract(n, Literal(1L)), None),
          emptyLongArray)
      case Seq(a, b) =>
        If(GreaterThan(b, a),
          Sequence(a, Subtract(b, Literal(1L)), None), emptyLongArray)
      case other => throw new IllegalArgumentException(s"range/$other")
    }
    reg("ends_with")(a => EndsWith(a(0), a(1)))
    // DuckDB's 4th regexp_replace arg is a FLAGS string ('g' = global,
    // which is Spark's only behavior); Spark's 4th arg is a position.
    // Accept and drop a literal 'g'; any other flag declines (skip).
    // The REPLACEMENT dialect differs too: DuckDB backreferences are
    // \1..\9, Java's are $1..$9 (and bare $ needs escaping) — convert
    // literal replacements at build time.
    def javaReplacement(e: Expression): Expression = e match {
      case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
        val converted = u.toString.replace("$", "\\$")
          .replaceAll("""\\(\d)""", "\\$$1")
        Literal(converted)
      case other => other
    }
    reg("duck_regexp_replace") {
      case Seq(x, p, r) => RegExpReplace(x, p, javaReplacement(r))
      case Seq(x, p, r, Literal(u: org.apache.spark.unsafe.types.UTF8String, _))
        if u.toString == "g" => RegExpReplace(x, p, javaReplacement(r))
      case other =>
        throw new IllegalArgumentException(s"regexp_replace flags: $other")
    }
    // DuckDB's 2-arg regexp_extract/_all default to GROUP 0 (the whole
    // match); Spark's default is group 1 — override the 2-arg forms
    reg("duck_regexp_extract_all") {
      case Seq(x, p) => RegExpExtractAll(x, p, Literal(0))
      case Seq(x, p, g) => RegExpExtractAll(x, p, g)
      case other => throw new IllegalArgumentException(s"regexp_extract_all/$other")
    }
    reg("duck_regexp_extract") {
      case Seq(x, p) => RegExpExtract(x, p, Literal(0))
      case Seq(x, p, g) => RegExpExtract(x, p, g)
      case other => throw new IllegalArgumentException(s"regexp_extract/$other")
    }
    // generate_series is INCLUSIVE on both ends; empty when b < a
    reg("generate_series") {
      case Seq(a, b) =>
        If(GreaterThanOrEqual(b, a), Sequence(a, b, None), emptyLongArray)
      case Seq(a, b, s) => Sequence(a, b, Some(s))
      case other => throw new IllegalArgumentException(s"generate_series/$other")
    }
  }

  // ---------------- textual rewrites (syntax-level constructs) ---------

  /** Rewrite a DuckDB oracle text into Spark SQL. Purely syntactic;
    * unknown constructs pass through (and then either fail to
    * parse/analyze — skipped by the sweep — or land in the exclusion
    * list when they parse with different semantics).
    */
  def translate(duck: String): String = {
    var s = duck
    // the md5-hex idiom: ('0x' || substr(md5(X), A, B))::BIGINT —
    // DuckDB casts hex strings numerically; Spark needs conv(…, 16, 10).
    // Exact for B = 8 hex digits (< 2^32, non-negative). Runs BEFORE
    // literal masking (it matches a '0x' literal); the inner md5 arg may
    // itself be one function call deep.
    s = """\('0x' \|\| substr\(md5\(((?:[^()]+|\([^()]*\))+)\), (\d+), (\d+)\)\)::BIGINT""".r
      .replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(
          s"CAST(conv(substr(md5(${m.group(1)}), ${m.group(2)}, ${m.group(3)}), 16, 10) AS BIGINT)"))
    // datediff/date_diff's unit is a KEYWORD in Spark, a string in
    // DuckDB — must run pre-masking (it matches the unit literal)
    s = """date_?diff\('(\w+)',""".r.replaceAllIn(s, m => s"datediff(${m.group(1)},")
    // Mask string literals: `//` inside a URL, brackets inside a regex,
    // or `::` inside any literal must never be rewritten as syntax.
    val (masked, lits) = maskLiterals(s)
    s = masked
    // remaining ('0x' || <any hex expr>)::BIGINT forms (the regex above
    // only reaches the one-level-deep md5 idiom): balanced-paren scan
    // per masked '0x' literal (each occurrence has its own marker).
    lits.zipWithIndex.foreach { case (l, i) =>
      if (l == "0x") s = rewriteHexCast(s, i)
    }
    // octet_length needs a blob in DuckDB (hence encode); Spark's
    // octet_length is byte length on strings directly
    s = """octet_length\(encode\((\w+(?:\.\w+)?)\)\)""".r
      .replaceAllIn(s, m => s"octet_length(${m.group(1)})")
    // DuckDB direct-cast type names Spark spells differently
    s = s.replace("AS VARCHAR", "AS STRING")
    s = s.replace("AS HUGEINT", "AS DECIMAL(38,0)")
    // DuckDB's DISTINCT list-aggregate: collect_set is the distinct
    // collect (unordered on both engines — callers sort downstream)
    s = s.replace("list(DISTINCT ", "collect_set(")
    // DuckDB's range TVF (exclusive upper, column named `range`) via the
    // registered list `range` — Spark's own range TVF names the column id
    s = """FROM range\(([^()]*)\)""".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"FROM (SELECT explode(range(${m.group(1)})) AS range)"))
    // generate_series as a FROM-item table function (constant args) →
    // a one-column subquery; Spark has no such TVF
    s = """generate_series\(([^()]*)\)\s+(?:AS\s+)?(\w+)\s*\((\w+)\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"(SELECT explode(generate_series(${m.group(1)})) AS ${m.group(3)}) ${m.group(2)}"))
    // The dotSql/d2Sql dot-product idiom → duck_dot (BoundedVectorDot):
    // the HOF chain is semantically right but interpreted-eval'd with two
    // array allocations + ~192 lambda dispatches per row — quadratic pair
    // scans over it run minutes-per-task. Must run BEFORE the ::cast and
    // [bracket] rewrites (it matches their raw DuckDB spellings).
    s = ("""list_reduce\(list_transform\(generate_series\(1,\s*(\d+)\),""" +
      """\s*i\s*->\s*([\w.]+)\[i\]::DOUBLE\s*\*\s*([\w.]+)\[i\]::DOUBLE\),""" +
      """\s*\(x,\s*y\)\s*->\s*x\s*\+\s*y\)""").r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"duck_dot(${m.group(2)}, ${m.group(3)}, ${m.group(1)})"))
    // struct_pack(k := v, ...) — DuckDB named-argument struct literal →
    // named_struct('k', v, ...)
    s = rewriteStructPack(s)
    // ASOF LEFT JOIN — DuckDB's point-in-time join syntax → the exact
    // relational equivalent: a LEFT OUTER LATERAL top-1 subquery
    s = rewriteAsofJoin(s)
    // quantile_disc(E, q) — DuckDB's discrete quantile aggregate; Spark
    // spells it percentile_disc(q) WITHIN GROUP (ORDER BY E) (identical
    // lower-discrete semantics at the q = 0.5 this surface uses)
    s = rewriteQuantileDisc(s)
    // PARALLEL unnest pairs in one SELECT list (DuckDB zips them
    // positionally) → ONE generator over the zipped struct array
    s = rewriteParallelUnnest(s)
    // FROM x, unnest(E) [AS] a(c)  →  FROM x LATERAL VIEW explode(E) a AS c
    s = rewriteFromUnnest(s)
    // remaining unnest (SELECT-list position) = Spark's explode generator
    s = s.replace("unnest(", "explode(")
    // DuckDB's in-aggregate ORDER BY: list(X ORDER BY K) and
    // string_agg(X, SEP ORDER BY K)
    s = rewriteOrderedAggs(s)
    s = rewriteDoubleColon(s)
    s = rewriteBrackets(s)
    // Dialect-variant BUILTINS route to duck_-prefixed registrations —
    // overriding the builtin name on the shared session would leak the
    // DuckDB semantics into the DataFrame implementations under test
    // (regexp_replace's replacement dialect did exactly that before
    // this rename). Order: _extract_all before _extract.
    // SUM over integers must widen like DuckDB's (BIGINT -> HUGEINT);
    // duck_sum dispatches on the RESOLVED child type, so double sums are
    // untouched and sums that feed >int64 moment arithmetic (q175's
    // slope, q177's covariances) stay exact
    s = """(?i)(?<![\w_])sum\(""".r.replaceAllIn(s, "duck_sum(")
    s = """(?<![\w_])regexp_replace\(""".r.replaceAllIn(s, "duck_regexp_replace(")
    s = """(?<![\w_])regexp_extract_all\(""".r.replaceAllIn(s, "duck_regexp_extract_all(")
    s = """(?<![\w_])regexp_extract\(""".r.replaceAllIn(s, "duck_regexp_extract(")
    s = """(?<![\w_])len\(""".r.replaceAllIn(s, "duck_len(")
    s = """(?<![\w_])chr\(""".r.replaceAllIn(s, "duck_chr(")
    s = """(?<![\w_])dayofweek\(""".r.replaceAllIn(s, "duck_dayofweek(")
    // offset window functions (lag/lead) referencing a NAMED window that
    // declares an explicit frame: DuckDB tolerates the redundant frame,
    // Spark rejects frames on offset functions — route them through a
    // frameless twin of the window
    s = rewriteOffsetFrames(s)
    // DuckDB nests IGNORE NULLS inside the call; Spark wants it after
    s = s.replace(" IGNORE NULLS)", ") IGNORE NULLS")
    // integer division; DuckDB's // on BIGINT == Spark's DIV for the
    // NON-NEGATIVE operands this surface uses (DuckDB floors toward
    // -inf, Spark truncates toward zero — negative-operand queries are
    // excluded by name in the spec)
    s = s.replace("//", " DIV ")
    unmaskLiterals(s, lits)
  }

  /** `('0x' || E)::BIGINT` → `CAST(conv(E, 16, 10) AS BIGINT)` with a
    * balanced-paren walk over E (E produces ≤ 8 hex digits on this
    * surface, where DuckDB's hex cast and conv base-16 agree exactly).
    * Runs on MASKED text: `lit` is the marker index of the "0x" literal.
    */
  private def rewriteHexCast(s0: String, lit: Int): String = {
    var s = s0
    val needle = "('\u0001" + lit + "\u0001' || "
    var idx = s.indexOf(needle)
    var guard = 0
    while (idx >= 0 && guard < 200) {
      guard += 1
      val close = matchParen(s, idx)
      if (close < 0) return s
      if (s.startsWith("::BIGINT", close + 1)) {
        val inner = s.substring(idx + needle.length, close)
        s = s.substring(0, idx) + s"CAST(conv($inner, 16, 10) AS BIGINT)" +
          s.substring(close + 1 + "::BIGINT".length)
        idx = s.indexOf(needle)
      } else idx = s.indexOf(needle, idx + 1)
    }
    s
  }

  /** Replace every '…' literal's content with a quote-free marker so the
    * syntax rewrites cannot see into strings; [[unmaskLiterals]] restores
    * them. Doubled '' escapes are preserved verbatim. `--` line comments
    * pass through verbatim — an apostrophe inside one (e.g. "-- the
    * writer's rule") is prose, not a literal opener; treating it as one
    * ran the phantom literal to end-of-text and appended a closing quote
    * that never existed (the pre-r15 q278 parse failure).
    */
  private def maskLiterals(s: String): (String, Vector[String]) = {
    val out = new StringBuilder
    val lits = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        // mask the COMMENT BODY like a literal: downstream rewrites must
        // never see comment content — a function name gets renamed inside
        // prose (cosmetic), and an unbalanced '(' in a comment derails
        // every matchParen-based rewrite for the rest of the text
        i += 2
        val body = new StringBuilder
        while (i < s.length && s.charAt(i) != '\n') { body.append(s.charAt(i)); i += 1 }
        lits += body.toString
        out.append("--").append('\u0001').append(n.toString).append('\u0001')
        n += 1
      } else if (c == '\'') {
        i += 1
        val body = new StringBuilder
        var closed = false
        while (i < s.length && !closed) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
              body.append("''"); i += 2
            } else { closed = true; i += 1 }
          } else { body.append(s.charAt(i)); i += 1 }
        }
        lits += body.toString
        out.append('\'').append('\u0001').append(n.toString).append('\u0001')
          .append('\'')
        n += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, lits.result())
  }

  /** Restore masked literals, DOUBLING backslashes: DuckDB string
    * literals are standard SQL (a backslash is a character), while
    * Spark's default parser treats it as an escape — an undoubled
    * `'\\s+'` regex would silently become `'s+'` and replace letters.
    */
  private def unmaskLiterals(s: String, lits: Vector[String]): String =
    "\u0001(\\d+)\u0001".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        lits(m.group(1).toInt).replace("\\", "\\\\")))

  /** `, unnest(E) [AS] a(c)` → ` LATERAL VIEW explode(E) a AS c`, and the
    * generate_series table-function form via the registered list variant.
    */
  private def rewriteFromUnnest(s0: String): String = {
    val s = new StringBuilder(s0)
    val pat = """,\s*(unnest|generate_series)\(""".r
    // scan with an explicit offset: an occurrence whose tail is NOT the
    // `alias(col)` table-function form (e.g. a select-list `unnest(x) AS
    // t`) must be SKIPPED, not end the scan — the pre-r15 while(changed)
    // loop stopped at the first such miss and left later FROM-position
    // unnests untranslated (q252's bg/tg chain)
    var from = 0
    var guard = 0
    while (guard < 500) {
      guard += 1
      pat.findFirstMatchIn(s.substring(from)) match {
        case Some(m) =>
          val start = from + m.start
          val open = from + m.end - 1
          val close = matchParen(s, open)
          if (close < 0) return s.toString
          val tail = """^\s+(?:AS\s+)?(\w+)\s*\((\w+)\)""".r
            .findFirstMatchIn(s.substring(close + 1))
          tail match {
            case Some(t) =>
              val inner = s.substring(open + 1, close)
              val gen =
                if (m.group(1) == "unnest") s"explode($inner)"
                else s"explode(generate_series($inner))"
              val repl = s" LATERAL VIEW $gen ${t.group(1)} AS ${t.group(2)}"
              s.replace(start, close + 1 + t.end, repl)
              from = start + repl.length
            case None => from = open // not the FROM form — skip past it
          }
        case None => return s.toString
      }
    }
    s.toString
  }

  /** `struct_pack(k := v, ...)` → `named_struct('k', v, ...)`. Runs on
    * masked text; the `:=` separator is DuckDB-only syntax so any
    * occurrence is a named argument (the masking keeps literal `:=`
    * bodies out of reach).
    */
  private def rewriteStructPack(s0: String): String = {
    var s = s0
    var idx = s.indexOf("struct_pack(")
    var guard = 0
    while (idx >= 0 && guard < 200) {
      guard += 1
      val open = idx + "struct_pack".length
      val close = matchParen(s, open)
      if (close < 0) return s
      val parts = splitTopLevel(s.substring(open + 1, close)).map { p =>
        val i = topLevelIndexOf(p, ":=")
        if (i < 0) return s // not the named-arg form — leave untouched
        s"'${p.substring(0, i).trim}', ${p.substring(i + 2).trim}"
      }
      s = s.substring(0, idx) + s"named_struct(${parts.mkString(", ")})" +
        s.substring(close + 1)
      idx = s.indexOf("struct_pack(")
    }
    s
  }

  /** `<l> ASOF LEFT JOIN <r> ON <eq-conjuncts> AND <ineq>` → the exact
    * relational expansion Spark can run:
    * `<l> LEFT OUTER JOIN LATERAL (SELECT * FROM <r> WHERE <cond>
    *  ORDER BY <right-time-expr> DESC|ASC LIMIT 1) <r> ON true`.
    * DuckDB's ASOF picks, per left row, the single right row extremal in
    * the inequality — which is precisely the lateral top-1. Direction:
    * `l.t >= r.t` (backward as-of) sorts the right time DESC; `<=`
    * (forward) sorts ASC. The right-table operand of the inequality is
    * the one referencing the right alias. Exact when the right side has
    * no ties on (eq keys, time) — DuckDB's own ASOF tie behavior is
    * unspecified, so oracles on this surface build tie-free right sides.
    */
  private def rewriteAsofJoin(s0: String): String = {
    var s = s0
    val pat = """(?<![\w_])(\w+)\s+ASOF\s+LEFT\s+JOIN\s+(\w+)\s+ON\s""".r
    var guard = 0
    var m0 = pat.findFirstMatchIn(s)
    while (m0.isDefined && guard < 20) {
      guard += 1
      val m = m0.get
      val r = m.group(2)
      val condStart = m.end
      // the ON condition ends at the first TOP-LEVEL clause keyword, an
      // unbalanced ')', or end of text
      val clauseKw = Set("ORDER", "GROUP", "WHERE", "HAVING", "LIMIT",
        "UNION", "QUALIFY", "JOIN", "LEFT", "RIGHT", "FULL", "INNER",
        "CROSS", "ASOF", "SELECT")
      var i = condStart
      var d = 0
      var end = s.length
      var done = false
      while (i < s.length && !done) {
        val c = s.charAt(i)
        if (c == '(') d += 1
        else if (c == ')') {
          if (d == 0) { end = i; done = true } else d -= 1
        } else if (d == 0 && (c.isLetter || c == '_') &&
          (i == 0 || {
            val p = s.charAt(i - 1)
            !p.isLetterOrDigit && p != '_' && p != '.'
          })) {
          val w = s.substring(i).takeWhile(ch => ch.isLetterOrDigit || ch == '_')
          if (clauseKw.contains(w.toUpperCase)) { end = i; done = true }
          else i += w.length - 1
        }
        i += 1
      }
      val cond = s.substring(condStart, end).trim
      val conjuncts = splitTopLevelAnd(cond)
      // the time conjunct is the >= / <= that RELATES the two sides:
      // exactly one operand references the right alias. A range bound on
      // one side alone ('a.x >= 0') listed first must not be chosen — it
      // would order the lateral top-1 by the wrong column.
      val ineqs = conjuncts.filter(p => p.contains(">=") || p.contains("<="))
      val ineq = ineqs.find { p =>
        val op = if (p.contains(">=")) ">=" else "<="
        val oi = p.indexOf(op)
        p.substring(0, oi).contains(r + ".") ^
          p.substring(oi + 2).contains(r + ".")
      }.orElse(ineqs.headOption)
      // a strict-inequality ASOF ('<' / '>') has DIFFERENT semantics (the
      // nearest row strictly before/after) — bail LOUDLY rather than leave
      // the text untranslated to surface as a confusing parse-skip
      if (ineq.isEmpty && conjuncts.exists(p =>
          p.contains("<") || p.contains(">")))
        throw new IllegalArgumentException(
          s"ASOF JOIN with a strict time inequality is not bridged: $cond")
      ineq match {
        case None => return s // not the shape we can expand
        case Some(p) =>
          val op = if (p.contains(">=")) ">=" else "<="
          val oi = p.indexOf(op)
          val lhs = p.substring(0, oi).trim
          val rhs = p.substring(oi + 2).trim
          val rOnRight = rhs.contains(r + ".")
          val rExpr = if (rOnRight) rhs else lhs
          val desc = (op == ">=" && rOnRight) || (op == "<=" && !rOnRight)
          val dir = if (desc) "DESC" else "ASC"
          val repl = s"${m.group(1)} LEFT OUTER JOIN LATERAL " +
            s"(SELECT * FROM $r WHERE $cond ORDER BY $rExpr $dir LIMIT 1) " +
            s"$r ON true "
          s = s.substring(0, m.start) + repl + s.substring(end)
      }
      m0 = pat.findFirstMatchIn(s)
    }
    s
  }

  /** Top-level " AND "-separated conjuncts (paren/bracket aware). */
  private def splitTopLevelAnd(cond: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var d = 0
    var last = 0
    var i = 0
    while (i < cond.length) {
      val c = cond.charAt(i)
      if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (d == 0 && cond.regionMatches(true, i, " AND ", 0, 5)) {
        out += cond.substring(last, i)
        last = i + 5
        i += 4
      }
      i += 1
    }
    out += cond.substring(last)
    out.result().map(_.trim)
  }

  /** `quantile_disc(E, q)` → `percentile_disc(q) WITHIN GROUP (ORDER BY E)`. */
  private def rewriteQuantileDisc(s0: String): String = {
    var s = s0
    var idx = s.indexOf("quantile_disc(")
    var guard = 0
    while (idx >= 0 && guard < 200) {
      guard += 1
      val open = idx + "quantile_disc".length
      val close = matchParen(s, open)
      if (close < 0) return s
      val parts = splitTopLevel(s.substring(open + 1, close))
      if (parts.length != 2) return s
      s = s.substring(0, idx) +
        s"percentile_disc(${parts(1).trim}) WITHIN GROUP (ORDER BY ${parts(0).trim})" +
        s.substring(close + 1)
      idx = s.indexOf("quantile_disc(")
    }
    s
  }

  /** `unnest(E1) AS n1, unnest(E2) AS n2` in a SELECT list — DuckDB zips
    * parallel unnests positionally — becomes ONE generator over the
    * zipped struct array:
    * `inline(zip_with(E1, E2, (l, r) -> named_struct('n1', l, 'n2', r)))`.
    * Exact: both engines pad the shorter list with NULLs. Only the
    * adjacent-pair form is rewritten (this surface has no 3-way case);
    * a single unnest falls through to the generic explode rewrite.
    */
  private def rewriteParallelUnnest(s0: String): String = {
    var s = s0
    var from = 0
    var guard = 0
    while (guard < 100) {
      guard += 1
      val i1 = s.indexOf("unnest(", from)
      if (i1 < 0) return s
      val c1 = matchParen(s, i1 + "unnest".length)
      if (c1 < 0) return s
      val m1 = """^\s+AS\s+(\w+)\s*,\s*unnest\(""".r
        .findFirstMatchIn(s.substring(c1 + 1))
      m1 match {
        case Some(m) =>
          val i2 = c1 + 1 + m.end - 1 // the second unnest's open paren
          val c2 = matchParen(s, i2)
          if (c2 < 0) return s
          val m2 = """^\s+AS\s+(\w+)""".r.findFirstMatchIn(s.substring(c2 + 1))
          m2 match {
            case Some(t) =>
              val e1 = s.substring(i1 + "unnest(".length, c1)
              val e2 = s.substring(i2 + 1, c2)
              val n1 = m.group(1)
              val n2 = t.group(1)
              val repl = s"inline(zip_with($e1, $e2, (u_zl, u_zr) -> " +
                s"named_struct('$n1', u_zl, '$n2', u_zr)))"
              s = s.substring(0, i1) + repl + s.substring(c2 + 1 + t.end)
              from = i1 + repl.length
            case None => from = i1 + 1
          }
        case None => from = i1 + 1
      }
    }
    s
  }

  /** Reroute `lag(...)/lead(...) OVER w` where the NAMED window `w`
    * declares an explicit frame: Spark rejects frames on offset
    * functions (DuckDB ignores the redundant declaration). A frameless
    * twin `w_gnf AS (<def without the ROWS/RANGE clause>)` is appended
    * to the WINDOW clause and the offset calls re-pointed at it; every
    * other consumer of `w` keeps the declared frame.
    */
  private def rewriteOffsetFrames(s0: String): String = {
    var s = s0
    // parse the WINDOW clause's named definitions
    val winKw = """(?<![\w_])WINDOW\s+""".r.findFirstMatchIn(s)
    if (winKw.isEmpty) return s
    var pos = winKw.get.end
    // name AS ( def ) [, name AS ( def )]*
    val defs = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var scanning = true
    while (scanning) {
      """^(\w+)\s+AS\s*\(""".r.findFirstMatchIn(s.substring(pos)) match {
        case Some(m) =>
          val open = pos + m.end - 1
          val close = matchParen(s, open)
          if (close < 0) return s
          defs += ((m.group(1), open, close))
          val next = """^\s*,\s*""".r.findFirstMatchIn(s.substring(close + 1))
          next match {
            case Some(c) => pos = close + 1 + c.end
            case None => scanning = false
          }
        case None => scanning = false
      }
    }
    val framed = defs.flatMap { case (name, open, close) =>
      val body = s.substring(open + 1, close)
      // the frame clause starts at the first top-level ROWS/RANGE
      // keyword (any whitespace before it, incl. newline in the
      // multi-line oracle texts)
      val fi = Seq(" ROWS ", "\nROWS", " RANGE ", "\nRANGE")
        .map(k => topLevelIndexOf(body, k)).filter(_ >= 0)
        .sorted.headOption
      fi.map(i => name -> (body.substring(0, i).trim, close))
    }.toMap
    if (framed.isEmpty) return s
    // re-point lag/lead OVER <name>; collect which twins are needed
    val used = scala.collection.mutable.LinkedHashSet.empty[String]
    val offsetPat = """(?<![\w_])(lag|lead)\s*\(""".r
    var out = s
    var search = 0
    var guard = 0
    while (guard < 200) {
      guard += 1
      offsetPat.findFirstMatchIn(out.substring(search)) match {
        case Some(m) =>
          val open = search + m.end - 1
          val close = matchParen(out, open)
          if (close < 0) return out
          val over = """^\s+OVER\s+(\w+)(?![\w(])""".r
            .findFirstMatchIn(out.substring(close + 1))
          over match {
            case Some(o) if framed.contains(o.group(1)) =>
              val name = o.group(1)
              used += name
              val refStart = close + 1 + o.start(1)
              val refEnd = close + 1 + o.end(1)
              out = out.substring(0, refStart) + s"${name}_gnf" +
                out.substring(refEnd)
              search = refEnd + 4
            case _ => search = close + 1
          }
        case None => guard = 200
      }
    }
    // append the frameless twins after their source definitions (later
    // insertions first so earlier offsets stay valid)
    used.toSeq.map(n => (framed(n)._2, n)).sortBy(-_._1).foreach {
      case (_, name) =>
        val (stripped, _) = framed(name)
        // defs were located in `s`; re-locate the twin's anchor in `out`
        // searching FROM the WINDOW keyword — a plain indexOf could match
        // a same-named CTE ('w AS (' is a plausible CTE header) earlier in
        // the text and splice the twin into the CTE's parens
        val winAt = """(?<![\w_])WINDOW\s""".r.findFirstMatchIn(out)
          .map(_.start).getOrElse(-1)
        val anchor =
          if (winAt < 0) -1 else out.indexOf(s"$name AS (", winAt)
        if (anchor >= 0) {
          val open = out.indexOf('(', anchor)
          val close = matchParen(out, open)
          if (close >= 0)
            out = out.substring(0, close + 1) +
              s", ${name}_gnf AS ($stripped)" + out.substring(close + 1)
        }
    }
    out
  }

  private def matchParen(s: CharSequence, open: Int): Int = {
    var d = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') d += 1
      else if (c == ')') { d -= 1; if (d == 0) return i }
      i += 1
    }
    -1
  }

  /** `list(X ORDER BY K…)` → sorted-struct collect + projection (Spark
    * has no in-aggregate ORDER BY for array_agg); `string_agg(X, SEP
    * ORDER BY K…)` → `listagg(X, SEP) WITHIN GROUP (ORDER BY K…)`.
    * Occurrences WITHOUT an ORDER BY are left alone (a bare `list` fails
    * to resolve and the query is skipped — an unordered collect could
    * not be hash-compared anyway).
    */
  private def rewriteOrderedAggs(s0: String): String = {
    var s = s0
    def pass(fname: String, build: (String, Seq[String]) => String): Unit = {
      var from = 0
      var scanning = true
      val pat = ("(?<![\\w_])" + fname + "\\(").r
      while (scanning) {
        scanning = false
        pat.findFirstMatchIn(s.substring(from)) match {
          case Some(m) =>
            val open = from + m.end - 1
            val close = matchParen(s, open)
            if (close < 0) return
            val body = s.substring(open + 1, close)
            val ob = topLevelIndexOf(body, " ORDER BY ")
            if (ob < 0) { from = from + m.end; scanning = true }
            else {
              val pre = body.substring(0, ob).trim
              val keys = splitTopLevel(body.substring(ob + " ORDER BY ".length))
              s = s.substring(0, from + m.start) + build(pre, keys) +
                s.substring(close + 1)
              from = 0
              scanning = true
            }
          case None => ()
        }
      }
    }
    pass("list", (x, keys) => {
      val ks = keys.zipWithIndex
        .map { case (k, i) => s"'k$i', ${k.trim}" }.mkString(", ")
      s"transform(sort_array(collect_list(named_struct($ks, 'v', $x))), g -> g.v)"
    })
    pass("string_agg", (pre, keys) =>
      s"listagg($pre) WITHIN GROUP (ORDER BY ${keys.map(_.trim).mkString(", ")})")
    s
  }

  private def topLevelIndexOf(body: String, needle: String): Int = {
    var d = 0
    var i = 0
    while (i <= body.length - needle.length) {
      val c = body.charAt(i)
      if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (d == 0 && body.regionMatches(i, needle, 0, needle.length))
        return i
      i += 1
    }
    -1
  }

  private def splitTopLevel(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var d = 0
    var last = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (c == ',' && d == 0) { out += body.substring(last, i); last = i + 1 }
      i += 1
    }
    out += body.substring(last)
    out.result()
  }

  /** `operand::TYPE` → `CAST(operand AS TYPE)`; operand = identifier
    * chain, string literal, or balanced (…)/[…] group (innermost-first
    * via repeated scan).
    */
  private def rewriteDoubleColon(s0: String): String = {
    var s = s0
    var idx = s.indexOf("::")
    var guard = 0
    while (idx >= 0 && guard < 500) {
      guard += 1
      // type name: letters plus optional (precision[, scale])
      var te = idx + 2
      while (te < s.length &&
        (s.charAt(te).isLetterOrDigit || s.charAt(te) == '_')) te += 1
      if (te < s.length && s.charAt(te) == '(') {
        var d = 0
        var k = te
        var end = -1
        while (k < s.length && end < 0) {
          val c = s.charAt(k)
          if (c == '(') d += 1
          else if (c == ')') { d -= 1; if (d == 0) end = k }
          k += 1
        }
        if (end < 0) return s
        te = end + 1
      }
      val tpe0 = s.substring(idx + 2, te)
      // DuckDB-only type names → Spark equivalents; HUGEINT (128-bit)
      // maps to the widest exact decimal
      val tpe = tpe0.toUpperCase match {
        case "VARCHAR" => "STRING"
        case "HUGEINT" => "DECIMAL(38,0)"
        case _ => tpe0
      }
      val begin = operandStart(s, idx - 1)
      if (begin < 0 || tpe.isEmpty) {
        // cannot resolve — leave as-is (will fail to parse and be skipped)
        return s
      }
      val operand = s.substring(begin, idx)
      s = s.substring(0, begin) + s"CAST($operand AS $tpe)" + s.substring(te)
      idx = s.indexOf("::")
    }
    s
  }

  /** Start index of the operand ending at `end` (inclusive): walks left
    * over an identifier chain, a string literal, or a CHAIN of balanced
    * ()/[] postfix groups with an optional function-name identifier at
    * the head — so `(f(x, y))[i]` and `arr[i][j]` resolve whole.
    */
  private def operandStart(s: String, end: Int): Int = {
    var i = end
    while (i >= 0 && s.charAt(i).isWhitespace) i -= 1
    if (i < 0) return -1
    var start = -1
    var cont = true
    while (cont) {
      cont = false
      val c = s.charAt(i)
      if (c == ')' || c == ']') {
        val open = if (c == ')') '(' else '['
        var d = 0
        var j = i
        var found = -1
        while (j >= 0 && found < 0) {
          val cc = s.charAt(j)
          if (cc == c) d += 1
          else if (cc == open) { d -= 1; if (d == 0) found = j }
          j -= 1
        }
        if (found < 0) return -1
        start = found
        i = found - 1
        if (i >= 0 && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) {
          start = identStart(s, i)
        } else if (i >= 0 && (s.charAt(i) == ')' || s.charAt(i) == ']')) {
          cont = true // chained postfix: (…)[…] / x[i][j]
        }
      } else if (c == '\'') {
        var j = i - 1
        while (j >= 0 && s.charAt(j) != '\'') j -= 1
        start = j
      } else if (c.isLetterOrDigit || c == '_') {
        start = identStart(s, i)
      } else return -1
    }
    start
  }

  /** Walk an identifier chain (`a.b.c`) left from `i`; returns the chain
    * start, or `i + 1` when there is none (a bare paren group).
    */
  private def identStart(s: String, i0: Int): Int = {
    var i = i0
    while (i >= 0 && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
      s.charAt(i) == '.')) i -= 1
    i + 1
  }

  /** DuckDB 1-based list indexing / slicing / literals:
    *   `x[i]`    → `try_element_at(x, i)` (1-based; NULL out of range)
    *   `x[a:b]`  → `slice(x, a, (b) - (a) + 1)` (both inclusive)
    *   `[…]`     → `array(…)`
    * Innermost-first so nested forms resolve.
    */
  private def rewriteBrackets(s0: String): String = {
    var s = s0
    var guard = 0
    var again = true
    while (again && guard < 200) {
      again = false
      guard += 1
      var i = 0
      var done = false
      while (i < s.length && !done) {
        if (s.charAt(i) == '[') {
          // innermost: no '[' before the matching ']'
          var j = i + 1
          var inner = -1
          var closed = -1
          while (j < s.length && closed < 0) {
            val c = s.charAt(j)
            if (c == '[') inner = j
            else if (c == ']') closed = j
            j += 1
          }
          if (closed < 0) return s
          if (inner >= 0) { i = inner } // descend to the inner bracket
          else {
            val body = s.substring(i + 1, closed)
            // indexing when the bracket follows an operand
            var p = i - 1
            while (p >= 0 && s.charAt(p).isWhitespace) p -= 1
            var isIndex = p >= 0 && (s.charAt(p).isLetterOrDigit ||
              s.charAt(p) == '_' || s.charAt(p) == ')' || s.charAt(p) == ']')
            var begin = -1
            if (isIndex) {
              begin = operandStart(s, p)
              if (begin < 0) return s
              // a KEYWORD before `[` means the bracket is a list literal
              // (`THEN ['a','b'][i]`), not an index into the keyword
              if (SqlKeywords(s.substring(begin, p + 1).toUpperCase))
                isIndex = false
            }
            if (isIndex) {
              val operand = s.substring(begin, i)
              // slice/element indexes arrive as BIGINT from range()/
              // sequence(); Spark's slice and element_at require INT.
              // A quoted index is a MAP key — no cast.
              val colon = topLevelColon(body)
              val repl =
                if (colon >= 0) {
                  val a = body.substring(0, colon).trim
                  val b = body.substring(colon + 1).trim
                  s"slice($operand, CAST(($a) AS INT), CAST(($b) - ($a) + 1 AS INT))"
                } else if (body.trim.startsWith("'"))
                  s"try_element_at($operand, $body)"
                else s"try_element_at($operand, CAST(($body) AS INT))"
              s = s.substring(0, begin) + repl + s.substring(closed + 1)
            } else {
              s = s.substring(0, i) + s"array($body)" + s.substring(closed + 1)
            }
            again = true
            done = true
          }
        } else i += 1
      }
    }
    s
  }

  /** Words that can directly precede a `[…]` list literal — an
    * identifier match against these means the bracket is NOT an index.
    */
  private val SqlKeywords = Set(
    "SELECT", "WHERE", "THEN", "ELSE", "WHEN", "CASE", "END", "AND", "OR",
    "NOT", "IN", "ON", "AS", "FROM", "BY", "UNION", "ALL", "DISTINCT",
    "HAVING", "JOIN", "LIKE", "IS", "NULL", "BETWEEN", "EXISTS", "OVER",
    "RETURN", "RETURNING", "VALUES", "SET", "ARRAY")

  // ---------------- materialized-CTE execution --------------------------

  /** Run an (already-translated) `WITH a AS (...), b AS (...) SELECT ...`
    * query with every CTE MATERIALIZED: each CTE body executes in
    * sequence, is localCheckpoint'ed (eager — the plan truncates to the
    * computed rows), and registers as a temp view the later bodies and
    * the tail resolve against.
    *
    * Why this exists: Spark's CTE handling INLINES each CTE body at every
    * reference (`WITH` is not an optimization fence), and collapse rules
    * then re-derive the whole upstream pipeline per reference. For a
    * reused CTE carrying heavy interpreted-eval work (the q341/q344
    * 130-element list synthesis referenced once per banded join probe)
    * that turns a seconds-long query into an hours-long one. Checkpointing
    * each CTE bounds the work to ONE evaluation per CTE — the semantics
    * are unchanged (every body is a self-contained SELECT).
    *
    * Returns the tail DataFrame and a cleanup that drops the temp views
    * (call it after collecting). Falls back to plain `spark.sql` when the
    * text has no leading WITH.
    */
  def runMaterializedCtes(spark: SparkSession, sql: String):
      (org.apache.spark.sql.DataFrame, () => Unit) =
    splitWithCtes(sql) match {
      case None => (spark.sql(sql), () => ())
      case Some((ctes, tail)) =>
        val registered = scala.collection.mutable.ArrayBuffer.empty[String]
        ctes.foreach { case (name, body) =>
          // repartition BEFORE checkpointing: these synth chains usually
          // descend from one tiny parquet file (1 partition), and the
          // interpreted higher-order-function eval downstream would
          // otherwise run on a single thread (q348's k=8 Lloyd assignment
          // measured 77+ s on one task vs ~3 s spread across the session's
          // shuffle partitions). Oracle texts are order-insensitive by
          // construction (deterministic aggregates + final ORDER BY).
          val df = spark.sql(body)
            .repartition(spark.sessionState.conf.numShufflePartitions)
            .localCheckpoint()
          df.createOrReplaceTempView(name)
          registered += name
        }
        (spark.sql(tail),
          () => registered.foreach(n => spark.catalog.dropTempView(n)))
    }

  /** Split `WITH n1 AS (b1), n2 AS (b2), ... <tail>` into its named
    * bodies and the tail, honoring string literals (quote-aware paren
    * matching — the text arrives UNMASKED). None when the text does not
    * start with WITH or the shape doesn't parse.
    */
  private[graft] def splitWithCtes(sql: String):
      Option[(Seq[(String, String)], String)] = {
    val m = """^\s*WITH\s+""".r.findFirstMatchIn(sql)
    if (m.isEmpty) return None
    var pos = m.get.end
    val out = Seq.newBuilder[(String, String)]
    var n = 0
    while (n < 500) {
      n += 1
      """^(\w+)\s+AS\s*\(""".r.findFirstMatchIn(sql.substring(pos)) match {
        case Some(h) =>
          val open = pos + h.end - 1
          val close = matchParenQuoted(sql, open)
          if (close < 0) return None
          out += ((h.group(1), sql.substring(open + 1, close)))
          """^\s*,\s*""".r.findFirstMatchIn(sql.substring(close + 1)) match {
            case Some(c) => pos = close + 1 + c.end
            case None => return Some((out.result(), sql.substring(close + 1)))
          }
        case None => return None
      }
    }
    None
  }

  /** Balanced-paren match that skips '…' string literals ('' escapes). */
  private def matchParenQuoted(s: String, open: Int): Int = {
    var d = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Index of a top-level `:` in a bracket body (slice separator), -1
    * when none; `::` never appears here (already rewritten).
    */
  private def topLevelColon(body: String): Int = {
    var d = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (c == ':' && d == 0) return i
      i += 1
    }
    -1
  }
}
