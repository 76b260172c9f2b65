package graft.operators

/** WARC (ISO 28500, the public web-archive format Common-Crawl-style
  * corpora ship in) RECORD walk: the parse a web-text lake runs over
  * its crawl payloads — record typing (warcinfo/request/response),
  * named-field headers, Content-Length-driven block extraction, and the
  * embedded HTTP response decode (status line, headers, body) that
  * yields the raw HTML a curation pipeline cleans next.
  *
  * Layout rules embodied here: every record is `WARC/1.0` CRLF, named
  * headers (case-insensitive names, single-line values), CRLF, exactly
  * Content-Length block bytes, CRLF CRLF; WARC-Type, WARC-Record-ID,
  * WARC-Date, and Content-Length are mandatory; records tile the file
  * exactly. For `response` records the block must carry an HTTP/1.1
  * response whose status line and headers are split off the body at the
  * first CRLF CRLF.
  *
  * Hostile-byte posture: [[probe]] never throws. A wrong version line,
  * a header without ': ', missing mandatory fields, a non-numeric or
  * lying Content-Length, a missing record trailer, trailing garbage,
  * or a response block without an HTTP status line all yield None.
  */
object WarcProbe {

  /** One record. `uri` is WARC-Target-URI when present; `status`,
    * `httpBody` only for response records.
    */
  final case class WarcRecord(warcType: String, recordId: String,
      date: String, uri: Option[String], blockLength: Long,
      status: Option[Int], httpBody: Option[Array[Byte]])

  final case class WarcInfo(records: Vector[WarcRecord]) {
    def nRecords: Int = records.length
    def ofType(t: String): Vector[WarcRecord] = records.filter(_.warcType == t)
    def totalBlockBytes: Long = records.map(_.blockLength).sum
  }

  private val Crlf = "\r\n".getBytes("ISO-8859-1")

  /** Index of the next CRLF at/after `from`, or -1. */
  private def findCrlf(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    while (i + 1 < limit) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Walk a whole file: records tiling exactly, each validated per the
    * scaladoc rules. None on any malformation; never throws.
    */
  def probe(b: Array[Byte]): Option[WarcInfo] = {
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    while (p < b.length) {
      // version line
      val vEnd = findCrlf(b, p, b.length)
      if (vEnd < 0 ||
        new String(b, p, vEnd - p, "ISO-8859-1") != "WARC/1.0") return None
      var q = vEnd + 2
      // named headers until the blank line
      var typ: String = null; var id: String = null; var date: String = null
      var uri: Option[String] = None; var clen = -1L
      var blank = false
      while (!blank) {
        val e = findCrlf(b, q, b.length)
        if (e < 0) return None
        if (e == q) blank = true
        else {
          val line = new String(b, q, e - q, "ISO-8859-1")
          val sep = line.indexOf(": ")
          if (sep < 1) return None
          val name = line.substring(0, sep).toLowerCase
          val value = line.substring(sep + 2)
          name match {
            case "warc-type" => typ = value
            case "warc-record-id" => id = value
            case "warc-date" => date = value
            case "warc-target-uri" => uri = Some(value)
            case "content-length" =>
              if (!value.nonEmpty || !value.forall(_.isDigit)) return None
              if (value.length > 15) return None
              clen = value.toLong
            case _ => () // optional fields are carried, not validated
          }
        }
        q = e + 2
      }
      if (typ == null || id == null || date == null || clen < 0) return None
      val blockStart = q
      if (blockStart + clen + 4 > b.length) return None
      val blockEnd = blockStart + clen.toInt
      // record trailer: exactly CRLF CRLF
      if (b(blockEnd) != '\r' || b(blockEnd + 1) != '\n' ||
        b(blockEnd + 2) != '\r' || b(blockEnd + 3) != '\n') return None
      var status: Option[Int] = None
      var body: Option[Array[Byte]] = None
      if (typ == "response") {
        // the block is an HTTP/1.1 response message
        val sEnd = findCrlf(b, blockStart, blockEnd)
        if (sEnd < 0) return None
        val statusLine = new String(b, blockStart, sEnd - blockStart, "ISO-8859-1")
        if (!statusLine.startsWith("HTTP/1.1 ") ||
          statusLine.length < 12) return None
        val code = statusLine.substring(9, 12)
        if (!code.forall(_.isDigit)) return None
        status = Some(code.toInt)
        // the body starts after the first CRLF CRLF inside the block
        var h = sEnd
        var bodyAt = -1
        while (bodyAt < 0 && h >= 0 && h + 3 < blockEnd) {
          if (b(h) == '\r' && b(h + 1) == '\n' && b(h + 2) == '\r' &&
            b(h + 3) == '\n') bodyAt = h + 4
          else h += 1
        }
        if (bodyAt < 0) return None
        body = Some(java.util.Arrays.copyOfRange(b, bodyAt, blockEnd))
      }
      out += WarcRecord(typ, id, date, uri, clen, status, body)
      p = blockEnd + 4
    }
    val rs = out.result()
    if (rs.isEmpty) return None
    Some(WarcInfo(rs))
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format.
  // ------------------------------------------------------------------

  /** One record to synthesize. For `response` records, `block` should
    * be built with [[httpResponse]].
    */
  final case class SynthRecord(warcType: String, recordId: String,
      date: String, uri: Option[String], block: Array[Byte])

  /** A minimal HTTP/1.1 response block: the status line with a constant
    * reason phrase, a text/plain content type, a blank line, the body.
    */
  def httpResponse(status: Int, body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: text/plain\r\n\r\n"
    head.getBytes("ISO-8859-1") ++ body
  }

  /** Synthesize a VALID WARC file from the records, with the exact
    * header layout the oracle's byte accounting mirrors. Real wire
    * format — [[probe]] is not told anything the bytes don't say.
    */
  def synth(records: Seq[SynthRecord]): Array[Byte] = {
    require(records.nonEmpty, "a WARC file holds at least one record")
    val out = new java.io.ByteArrayOutputStream()
    def line(s: String): Unit = {
      val bytes = s.getBytes("ISO-8859-1")
      out.write(bytes, 0, bytes.length)
      out.write(Crlf, 0, 2)
    }
    records.foreach { r =>
      line("WARC/1.0")
      line(s"WARC-Type: ${r.warcType}")
      line(s"WARC-Record-ID: <urn:uuid:${r.recordId}>")
      line(s"WARC-Date: ${r.date}")
      r.uri.foreach(u => line(s"WARC-Target-URI: $u"))
      line(s"Content-Length: ${r.block.length}")
      line("")
      out.write(r.block, 0, r.block.length)
      out.write(Crlf, 0, 2); out.write(Crlf, 0, 2)
    }
    out.toByteArray
  }
}
