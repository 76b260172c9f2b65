package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Subtitles
import graft.operators.Subtitles.Cue

/** SRT/WebVTT parsing: timestamp rules, index monotonicity, dialect
  * differences, and malformed-input rejection.
  */
class SubtitlesSpec extends AnyFunSuite {

  private val cues = Seq(
    Cue(1, 500, 2500, Vector("hello there")),
    Cue(2, 3000, 5000, Vector("two", "lines")),
    Cue(3, 3661234, 3662000, Vector("an hour in")))

  test("srt round trip: times, indices, multi-line text") {
    val text = Subtitles.renderSrt(cues)
    assert(text.contains("00:00:00,500 --> 00:00:02,500"))
    assert(text.contains("01:01:01,234")) // hour/minute/second carry
    val parsed = Subtitles.parseSrt(text).get
    assert(parsed.map(_.index) == Vector(1, 2, 3))
    assert(parsed(0).startMs == 500 && parsed(0).endMs == 2500)
    assert(parsed(1).text == "two\nlines")
    assert(parsed(2).startMs == 3661234L)
  }

  test("vtt round trip: dot millis, identifiers, cue settings tolerated") {
    val text = Subtitles.renderVtt(cues)
    assert(text.startsWith("WEBVTT\n\n"))
    assert(text.contains("00:00:00.500 --> 00:00:02.500"))
    val parsed = Subtitles.parseVtt(text).get
    assert(parsed.map(c => (c.startMs, c.endMs, c.text)) ==
      Subtitles.parseSrt(Subtitles.renderSrt(cues)).get
        .map(c => (c.startMs, c.endMs, c.text)))
    // trailing cue settings after the end stamp parse fine
    val withSettings = text.replace("00:00:00.500 --> 00:00:02.500",
      "00:00:00.500 --> 00:00:02.500 align:start line:0%")
    assert(Subtitles.parseVtt(withSettings).get.head.endMs == 2500)
    // a cue without an identifier line also parses
    val noId = "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nplain\n"
    assert(Subtitles.parseVtt(noId).get.head.text == "plain")
  }

  test("malformed inputs reject, never throw") {
    assert(Subtitles.parseSrt("").isEmpty)
    assert(Subtitles.parseVtt("").isEmpty)
    val good = Subtitles.renderSrt(cues)
    // minutes 60 / seconds 60
    assert(Subtitles.parseSrt(good.replace("00:00:00,500", "00:60:00,500")).isEmpty)
    assert(Subtitles.parseSrt(good.replace("00:00:00,500", "00:00:60,500")).isEmpty)
    // wrong separator for the dialect
    assert(Subtitles.parseSrt(good.replace("00:00:00,500", "00:00:00.500")).isEmpty)
    assert(Subtitles.parseVtt(Subtitles.renderVtt(cues)
      .replace("00:00:00.500", "00:00:00,500")).isEmpty)
    // end <= start
    assert(Subtitles.parseSrt(good.replace(
      "00:00:00,500 --> 00:00:02,500",
      "00:00:02,500 --> 00:00:00,500")).isEmpty)
    // a non-sequential index
    assert(Subtitles.parseSrt(good.replace("\n\n2\n", "\n\n7\n")).isEmpty)
    // a cue with no text line
    assert(Subtitles.parseSrt("1\n00:00:00,000 --> 00:00:01,000\n").isEmpty)
    // missing WEBVTT header
    assert(Subtitles.parseVtt("00:00:01.000 --> 00:00:02.000\nx\n").isEmpty)
    // narrow field widths (single-digit hour)
    assert(Subtitles.parseSrt(good.replace("00:00:00,500", "0:00:00,500")).isEmpty)
  }

  test("vtt document model: NOTE/STYLE/REGION blocks and cue settings") {
    import Subtitles.Cue
    val cues = Seq(
      Cue(1, 500, 2000, Vector("first"), "align:center line:10%"),
      Cue(2, 3000, 4500, Vector("second")),
      Cue(3, 5000, 6000, Vector("third"), "align:end"))
    val txt = Subtitles.renderVttRich(cues,
      regionLines = Seq("id:r1", "width:50%"),
      styleLines = Seq("::cue {", "  color: peru;", "}"),
      notesBefore = Seq("machine transcript"),
      midNotes = Map(1 -> "speaker change"))
    val doc = Subtitles.parseVttDoc(txt).get
    assert(doc.cues.map(_.text) == Vector("first", "second", "third"))
    assert(doc.cues.map(_.settings) ==
      Vector("align:center line:10%", "", "align:end"))
    assert(doc.nNotes == 2 && doc.nStyles == 1 && doc.nRegions == 1)
    assert(doc.styleText == "::cue {\n  color: peru;\n}")
    // parseVtt (cues-only) accepts the same document
    assert(Subtitles.parseVtt(txt).get.map(_.startMs) ==
      Vector(500L, 3000L, 5000L))
    // a STYLE block after the first cue rejects (spec placement rule)
    val lateStyle = txt + "\nSTYLE\n::cue { color: red; }\n"
    assert(Subtitles.parseVttDoc(lateStyle).isEmpty)
    // a REGION block after a cue rejects too
    assert(Subtitles.parseVttDoc(txt + "\nREGION\nid:r2\n").isEmpty)
    // a NOTE containing the cue arrow rejects
    val badNote = txt.replace("NOTE speaker change",
      "NOTE speaker --> change")
    assert(Subtitles.parseVttDoc(badNote).isEmpty)
    // NOTE after cues is fine (comments are legal anywhere)
    assert(Subtitles.parseVttDoc(txt + "\nNOTE trailing\n").get.nNotes == 3)
    // settings survive the q244-style round trip untouched
    val again = Subtitles.parseVttDoc(
      Subtitles.renderVttRich(doc.cues, Nil, Nil, Nil, Map.empty)).get
    assert(again.cues.map(c => (c.startMs, c.endMs, c.settings)) ==
      cues.map(c => (c.startMs, c.endMs, c.settings)).toVector)
  }
}
