package graft.operators

/** CSV DIALECT INFERENCE + STRICT PARSE (RFC 4180, the public CSV
  * spec): the first thing an ingest pipeline does to a pile of
  * delimiter-ambiguous text files — try each candidate delimiter with
  * a QUOTE-AWARE parse (delimiters inside quoted fields must not
  * count: the classic false signal), keep the candidates under which
  * every record has the same field arity ≥ 2, and pick the one with
  * the highest arity (first-candidate order breaking ties).
  *
  * The parser is the strict RFC form: fields either unquoted (no
  * quote characters at all) or fully quoted with `""` escaping an
  * embedded quote; quoted fields MAY contain delimiters and EMBEDDED
  * NEWLINES (so record counting must run through the parser, not a
  * line split); a closing quote must be followed by a delimiter or a
  * record boundary. Anything else — a stray quote mid-field, an
  * unterminated quote at EOF — rejects.
  *
  * Hostile posture: [[parse]] and [[infer]] never throw; malformed
  * text yields None (inference simply skips candidates whose parse
  * fails or is inconsistent).
  */
object CsvDialect {

  final case class Dialect(delimiter: Char, nFields: Int, nRecords: Int,
      anyQuoted: Boolean)

  /** Strict RFC 4180 parse under one delimiter. None on malformation. */
  def parse(text: String, delim: Char): Option[Vector[Vector[String]]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var fields = Vector.newBuilder[String]
    val cell = new StringBuilder
    var i = 0
    val n = text.length
    var inQuotes = false
    var cellQuoted = false
    var cellStarted = false
    var anyField = false
    def endField(): Unit = {
      fields += cell.toString
      cell.clear()
      cellQuoted = false
      cellStarted = false
      anyField = true
    }
    def endRecord(): Unit = {
      endField()
      rows += fields.result()
      fields = Vector.newBuilder[String]
      anyField = false // a trailing newline must not mint a phantom record
    }
    while (i < n) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && text.charAt(i + 1) == '"') { cell.append('"'); i += 1 }
          else inQuotes = false
        } else cell.append(c)
      } else if (c == '"') {
        if (cellStarted || cellQuoted) return None // a quote mid-field,
        // or anything after a closed quote but the delimiter/EOL
        inQuotes = true
        cellQuoted = true
        cellStarted = true
      } else if (c == delim) endField()
      else if (c == '\n') endRecord()
      else {
        if (cellQuoted) return None // unquoted text after a closed quote
        cell.append(c)
        cellStarted = true
      }
      i += 1
    }
    if (inQuotes) return None // unterminated quote at EOF
    if (cellStarted || cellQuoted || anyField) endRecord() // final record
    val out = rows.result()
    if (out.isEmpty) None else Some(out)
  }

  /** Infer the delimiter per the scaladoc rules. */
  def infer(text: String,
      candidates: Seq[Char] = Seq(',', ';', '\t', '|')): Option[Dialect] = {
    val scored = candidates.flatMap { d =>
      parse(text, d).flatMap { rows =>
        val arity = rows.head.length
        if (arity >= 2 && rows.forall(_.length == arity))
          Some(Dialect(d, arity, rows.length, text.contains('"')))
        else None
      }
    }
    if (scored.isEmpty) None
    else Some(scored.maxBy(_.nFields)) // stable: first candidate wins ties
  }

  /** Render rows under a dialect: a field is quoted when it contains
    * the delimiter, a quote, or a newline (quotes doubled) — the RFC
    * writer rules.
    */
  def render(rows: Seq[Seq[String]], delim: Char): String =
    rows.map(_.map { f =>
      if (f.contains(delim) || f.contains('"') || f.contains('\n'))
        "\"" + f.replace("\"", "\"\"") + "\""
      else f
    }.mkString(delim.toString)).mkString("\n")
}
