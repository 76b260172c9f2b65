package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the dialect bridge's SCANNERS — the end-to-end proof is
  * `SqlFrontDoorSpec` (327 oracles must match the DataFrame surface);
  * these cases pin the tricky textual rules against regressions without
  * a SparkSession.
  */
class DuckSqlBridgeSpec extends AnyFunSuite {

  private def t(s: String): String = DuckSqlBridge.translate(s)

  test("::casts: identifier, paren chain, postfix-indexed operands") {
    assert(t("SELECT a::BIGINT") == "SELECT CAST(a AS BIGINT)")
    assert(t("SELECT f(x, y)::DOUBLE") == "SELECT CAST(f(x, y) AS DOUBLE)")
    // postfix chain: the whole (g(x))[i] is the operand, not just [i]
    assert(t("SELECT (g(x))[i]::DOUBLE") ==
      "SELECT CAST(try_element_at((g(x)), CAST((i) AS INT)) AS DOUBLE)")
    assert(t("SELECT x::DECIMAL(38,0)") == "SELECT CAST(x AS DECIMAL(38,0))")
    // DuckDB-only names map
    assert(t("SELECT x::VARCHAR") == "SELECT CAST(x AS STRING)")
    assert(t("SELECT x::HUGEINT") == "SELECT CAST(x AS DECIMAL(38,0))")
  }

  test("brackets: literals vs indexing vs slices; keywords guard") {
    assert(t("SELECT [1, 2, 3]") == "SELECT array(1, 2, 3)")
    assert(t("SELECT arr[i]") ==
      "SELECT try_element_at(arr, CAST((i) AS INT))")
    assert(t("SELECT arr[1 : n]") ==
      "SELECT slice(arr, CAST((1) AS INT), CAST((n) - (1) + 1 AS INT))")
    // a keyword before [ means a literal, not an index into the keyword
    assert(t("CASE WHEN c THEN ['a', 'b'][i] ELSE x END").contains(
      "try_element_at(array('a', 'b'), CAST((i) AS INT))"))
    // quoted index = map key, no cast
    assert(t("SELECT m['k']") == "SELECT try_element_at(m, 'k')")
  }

  test("string literals are opaque: //, ::, brackets survive inside") {
    assert(t("SELECT 'https://x.org/a[1]::b'") ==
      "SELECT 'https://x.org/a[1]::b'")
    // an apostrophe inside a -- comment is prose, not a literal opener
    // (the phantom literal used to run to EOS and grow an extra quote)
    assert(t("SELECT a // 2 -- the writer's rule\nFROM t") ==
      "SELECT a  DIV  2 -- the writer's rule\nFROM t")
    // backslashes DOUBLE so Spark's escaped-string parser round-trips
    // the raw DuckDB literal (an undoubled \s+ becomes s+)
    assert(t("SELECT regexp_matches(x, '\\s+')") ==
      "SELECT regexp_matches(x, '\\\\s+')")
  }

  test("integer division and hex casts") {
    assert(t("SELECT a // b") == "SELECT a  DIV  b")
    assert(t("SELECT ('0x' || substr(md5(text), 1, 8))::BIGINT") ==
      "SELECT CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT)")
    // nested args route through the balanced-paren scanner
    assert(t("SELECT ('0x' || substr(md5('k' || x::VARCHAR), 9, 8))::BIGINT")
      .contains("conv("))
  }

  test("ordered aggregates and lateral unnest") {
    assert(t("SELECT list(v ORDER BY k1, k2) FROM t") ==
      "SELECT transform(sort_array(collect_list(named_struct('k0', k1, " +
        "'k1', k2, 'v', v))), g -> g.v) FROM t")
    assert(t("SELECT string_agg(v, ',' ORDER BY k) FROM t") ==
      "SELECT listagg(v, ',') WITHIN GROUP (ORDER BY k) FROM t")
    assert(t("FROM a, unnest([1, 2]) AS u(j)") ==
      "FROM a LATERAL VIEW explode(array(1, 2)) u AS j")
    assert(t("FROM generate_series(-3, 3) g(i)") ==
      "FROM (SELECT explode(generate_series(-3, 3)) AS i) g")
  }

  test("builtin-variant functions rename to duck_ registrations only in " +
    "translated text") {
    assert(t("SELECT regexp_replace(w, '(.)', '\\1 ', 'g')") ==
      "SELECT duck_regexp_replace(w, '(.)', '\\\\1 ', 'g')")
    assert(t("SELECT len(xs)") == "SELECT duck_len(xs)")
    assert(t("SELECT length(x)") == "SELECT length(x)") // not len(
    assert(t("SELECT chr(97 + n % 26)") == "SELECT duck_chr(97 + n % 26)")
    assert(t("SELECT dayofweek(d)") == "SELECT duck_dayofweek(d)")
    assert(t("SELECT 'chr(' || x") == "SELECT 'chr(' || x") // literal opaque
  }

  test("struct_pack named args become named_struct") {
    assert(t("SELECT struct_pack(a := x + 1, b := f(y, z))") ==
      "SELECT named_struct('a', x + 1, 'b', f(y, z))")
    // nested calls with := only at top level of each part
    assert(t("SELECT (max(struct_pack(ts := ts, id := id))).id") ==
      "SELECT (max(named_struct('ts', ts, 'id', id))).id")
  }

  test("quantile_disc becomes percentile_disc WITHIN GROUP") {
    assert(t("SELECT quantile_disc(x, 0.5) FROM t GROUP BY 1") ==
      "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY x) " +
        "FROM t GROUP BY 1")
    assert(t("SELECT quantile_disc(abs(x - m), 0.5)") ==
      "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(x - m))")
  }

  test("parallel unnest pair zips through one inline generator") {
    assert(t("SELECT unnest([0, 1]) AS row, unnest([a, b]) AS bucket FROM k") ==
      "SELECT inline(zip_with(array(0, 1), array(a, b), (u_zl, u_zr) -> " +
        "named_struct('row', u_zl, 'bucket', u_zr))) FROM k")
    // a single unnest keeps the generic explode rewrite
    assert(t("SELECT unnest([1, 2]) AS v") == "SELECT explode(array(1, 2)) AS v")
    // the FROM-position unnest form is untouched by the pair rule
    assert(t("FROM a, unnest([1, 2]) AS u(j)") ==
      "FROM a LATERAL VIEW explode(array(1, 2)) u AS j")
  }

  test("offset functions drop frames via a frameless twin window") {
    val in = """SELECT lag(v, 1) OVER w AS d, SUM(v) OVER w AS s FROM t
      WINDOW w AS (PARTITION BY u ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
    val out = t(in)
    assert(out.contains("lag(v, 1) OVER w_gnf"), out)
    // non-offset keeps w (the sum itself routes through duck_sum — the
    // HUGEINT-widening rename)
    assert(out.contains("duck_sum(v) OVER w AS s"), out)
    assert(out.contains("w_gnf AS (PARTITION BY u ORDER BY ts)"), out)
    assert(out.contains("ROWS BETWEEN"), out) // original frame retained
    // frameless named windows are untouched
    val plain = t("SELECT lag(v) OVER w FROM t WINDOW w AS (ORDER BY ts)")
    assert(!plain.contains("_gnf"), plain)
  }

  test("ASOF LEFT JOIN expands to a lateral top-1 subquery") {
    val in = """FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY event_id"""
    val out = t(in)
    assert(out.contains("LEFT OUTER JOIN LATERAL"), out)
    assert(out.contains(
      "(SELECT * FROM p WHERE c.user_id = p.user_id AND c.ts >= p.ts " +
        "ORDER BY p.ts DESC LIMIT 1) p ON true"), out)
    assert(out.contains("ORDER BY event_id"), out) // outer clause survives
    // forward as-of sorts ascending
    assert(t("FROM c ASOF LEFT JOIN p ON c.k = p.k AND c.ts <= p.ts")
      .contains("ORDER BY p.ts ASC LIMIT 1"))
  }

  test("splitWithCtes: quote-aware CTE chain split") {
    val Some((ctes, tail)) = DuckSqlBridge.splitWithCtes(
      "WITH a AS (SELECT 1 AS x), b AS (SELECT x, '(,)' AS s FROM a) " +
        "SELECT * FROM b"): @unchecked
    assert(ctes.map(_._1) == Seq("a", "b"))
    assert(ctes(1)._2 == "SELECT x, '(,)' AS s FROM a")
    assert(tail.trim == "SELECT * FROM b")
    assert(DuckSqlBridge.splitWithCtes("SELECT 1").isEmpty)
  }
}
