package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CsvDialect

/** CSV dialect inference + RFC 4180 parse: quote-aware delimiter
  * scoring, escaped quotes, embedded delimiters/newlines, and the
  * malformation rules.
  */
class CsvDialectSpec extends AnyFunSuite {

  test("round trip: quoting rules, escapes, embedded delimiters/newlines") {
    val rows = Seq(
      Seq("id", "name", "note"),
      Seq("1", "plain", "semi;colon"),
      Seq("2", "with,comma", "say \"hi\""),
      Seq("3", "line\nbreak", ""))
    val text = CsvDialect.render(rows, ',')
    val parsed = CsvDialect.parse(text, ',').get
    assert(parsed == rows.map(_.toVector).toVector)
    // the comma inside a quoted field must NOT split
    assert(parsed(2)(1) == "with,comma")
    assert(parsed(2)(2) == "say \"hi\"")
    assert(parsed(3)(1) == "line\nbreak")
  }

  test("inference picks the consistent quote-aware delimiter") {
    val rows = Seq(Seq("a", "b;x", "c"), Seq("d", "e", "f,g"))
    // comma dialect: the ; inside a field would fool a naive counter
    val text = CsvDialect.render(rows, ',')
    val d = CsvDialect.infer(text).get
    assert(d.delimiter == ',' && d.nFields == 3 && d.nRecords == 2)
    assert(d.anyQuoted)
    // the same rows under ';': inference must flip
    val text2 = CsvDialect.render(rows, ';')
    val d2 = CsvDialect.infer(text2).get
    assert(d2.delimiter == ';' && d2.nFields == 3)
    // tab dialect
    val d3 = CsvDialect.infer(CsvDialect.render(rows, '\t')).get
    assert(d3.delimiter == '\t')
    // a single-column pile has no delimiter signal: None
    assert(CsvDialect.infer("one\ntwo\nthree").isEmpty)
    // ragged arity under every candidate: None
    assert(CsvDialect.infer("a,b\nc,d,e").isEmpty)
  }

  test("trailing newline does not mint a phantom record") {
    val p = CsvDialect.parse("a,b\nc,d\n", ',').get
    assert(p == Vector(Vector("a", "b"), Vector("c", "d")))
  }

  test("malformations reject: stray quotes, unterminated quotes") {
    assert(CsvDialect.parse("a,b\"c", ',').isEmpty) // quote mid-field
    assert(CsvDialect.parse("\"ab\"x,c", ',').isEmpty) // text after close
    assert(CsvDialect.parse("\"never closed", ',').isEmpty)
    assert(CsvDialect.parse("", ',').isEmpty)
    // an escaped quote at the very end still closes cleanly
    assert(CsvDialect.parse("a,\"x\"\"y\"", ',').get ==
      Vector(Vector("a", "x\"y")))
  }
}
