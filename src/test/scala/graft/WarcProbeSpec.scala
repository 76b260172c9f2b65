package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WarcProbe
import graft.operators.WarcProbe.SynthRecord

/** WARC record walk: header rules, Content-Length block extraction,
  * the embedded HTTP response decode, and the hostile-byte sweep.
  */
class WarcProbeSpec extends AnyFunSuite {

  private val date = "2024-03-01T10:00:00Z"

  private def file() = WarcProbe.synth(Seq(
    SynthRecord("warcinfo", "w1", date, None,
      "software: graft\r\n".getBytes("ISO-8859-1")),
    SynthRecord("request", "r1", date, Some("http://a.example/x"),
      "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("ISO-8859-1")),
    SynthRecord("response", "s1", date, Some("http://a.example/x"),
      WarcProbe.httpResponse(200, "hello crawl".getBytes("ISO-8859-1")))))

  test("round trip: types, ids, uris, blocks, http decode") {
    val b = file()
    val w = WarcProbe.probe(b).get
    assert(w.nRecords == 3)
    assert(w.records.map(_.warcType) == Vector("warcinfo", "request", "response"))
    assert(w.records.map(_.recordId) ==
      Vector("<urn:uuid:w1>", "<urn:uuid:r1>", "<urn:uuid:s1>"))
    assert(w.records.forall(_.date == date))
    assert(w.records.head.uri.isEmpty)
    assert(w.records(1).uri.contains("http://a.example/x"))
    val resp = w.ofType("response").head
    assert(resp.status.contains(200))
    assert(new String(resp.httpBody.get, "ISO-8859-1") == "hello crawl")
    assert(w.totalBlockBytes == 17 + 36 + (45 + 11))
  }

  test("a 404 with an empty body parses; extra headers are carried") {
    val b = WarcProbe.synth(Seq(
      SynthRecord("response", "s2", date, Some("http://a.example/gone"),
        WarcProbe.httpResponse(404, Array.emptyByteArray))))
    val w = WarcProbe.probe(b).get
    val r = w.records.head
    assert(r.status.contains(404) && r.httpBody.get.isEmpty)
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = file()
    assert(WarcProbe.probe(Array.emptyByteArray).isEmpty)
    assert(WarcProbe.probe("WARC/1.0".getBytes).isEmpty) // no CRLF ever
    assert(WarcProbe.probe(b.dropRight(1)).isEmpty) // truncated trailer
    assert(WarcProbe.probe(b ++ "junk".getBytes).isEmpty) // trailing garbage
    def mut(f: Array[Byte] => Unit): Option[WarcProbe.WarcInfo] = {
      val c = b.clone(); f(c); WarcProbe.probe(c)
    }
    assert(mut(_(5) = '2'.toByte).isEmpty) // WARC/2.0
    // break a header separator: "WARC-Type: warcinfo" -> "WARC-Type:_w..."
    val typeAt = 10 + "WARC-Type".length
    assert(mut(_(typeAt) = '_'.toByte).isEmpty)
    // Content-Length lying high: first record's CL is the 2-digit "17"
    val cl = new String(b, 0, 200, "ISO-8859-1").indexOf("Content-Length: ")
    assert(cl > 0)
    assert(mut(_(cl + 16) = '9'.toByte).isEmpty) // 17 -> 97: block overruns
    assert(mut(_(cl + 16) = 'x'.toByte).isEmpty) // non-numeric
    // a record missing WARC-Date: synthesize by hand without it
    val noDate = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Record-ID: <urn:uuid:x>\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(WarcProbe.probe(noDate).isEmpty)
    // a response whose block is not an HTTP message
    val notHttp = WarcProbe.synth(Seq(
      SynthRecord("response", "s3", date, None,
        "plain bytes, no status line\r\n\r\n".getBytes("ISO-8859-1"))))
    assert(WarcProbe.probe(notHttp).isEmpty)
    // a response with a status line but no blank line before the body
    val noBlank = WarcProbe.synth(Seq(
      SynthRecord("response", "s4", date, None,
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n".getBytes("ISO-8859-1"))))
    assert(WarcProbe.probe(noBlank).isEmpty)
  }

  test("records must tile the file: a record inside another's block is data") {
    // a block that CONTAINS a full WARC record as bytes: the walk must
    // treat it as payload (Content-Length wins), not recurse into it
    val inner = file()
    val b = WarcProbe.synth(Seq(
      SynthRecord("warcinfo", "outer", date, None, inner)))
    val w = WarcProbe.probe(b).get
    assert(w.nRecords == 1 && w.records.head.blockLength == inner.length)
  }
}
