package graft.operators

/** SUBTITLE parsing (SRT and WebVTT, the two public caption formats a
  * video lake's transcripts arrive in): cue-block walk, strict
  * timestamp decode, monotonic-index and time-sanity rules — the
  * alignment layer that pairs video payloads with their text for
  * multimodal training data.
  *
  * Dialect rules embodied here: SRT blocks are [integer index,
  * `HH:MM:SS,mmm --> HH:MM:SS,mmm`, 1+ text lines] separated by blank
  * lines, indices strictly 1..n in order; WebVTT opens with a `WEBVTT`
  * header line, uses a DOT before the milliseconds, allows an optional
  * cue-identifier line and trailing cue settings after the end
  * timestamp. Both decode to the same cue model, so a file pair can be
  * cross-checked cue for cue.
  *
  * Hostile posture: parsers never throw. A malformed timestamp
  * (minutes/seconds >= 60, wrong separator, wrong field widths), a
  * non-sequential SRT index, end <= start, a cue without text, or a
  * missing WEBVTT header all yield None.
  */
object Subtitles {

  final case class Cue(index: Int, startMs: Long, endMs: Long,
      lines: Vector[String], settings: String = "") {
    def durationMs: Long = endMs - startMs
    def text: String = lines.mkString("\n")
  }

  /** A full WebVTT document: cues plus the non-cue block accounting —
    * NOTE comments (legal anywhere), STYLE and REGION blocks (legal
    * only before the first cue, enforced), and the concatenated CSS
    * text of every STYLE block.
    */
  final case class VttDoc(cues: Vector[Cue], nNotes: Int, nStyles: Int,
      nRegions: Int, styleText: String)

  private val SrtTime =
    """(\d\d):(\d\d):(\d\d),(\d\d\d) --> (\d\d):(\d\d):(\d\d),(\d\d\d)""".r
  private val VttTime =
    """(\d\d):(\d\d):(\d\d)\.(\d\d\d) --> (\d\d):(\d\d):(\d\d)\.(\d\d\d)(?: (.+))?""".r

  private def ms(h: String, m: String, s: String, f: String): Option[Long] = {
    val (hh, mm, ss, fff) = (h.toInt, m.toInt, s.toInt, f.toInt)
    if (mm >= 60 || ss >= 60) return None
    Some(hh * 3600000L + mm * 60000L + ss * 1000L + fff)
  }

  private def blocks(body: String): Vector[Vector[String]] =
    body.split("\r?\n", -1).toVector
      .foldLeft(Vector(Vector.empty[String])) { (acc, line) =>
        if (line.isEmpty) acc :+ Vector.empty
        else acc.init :+ (acc.last :+ line)
      }.filter(_.nonEmpty)

  /** Parse SubRip text: cue indices must run 1..n in order. */
  def parseSrt(s: String): Option[Vector[Cue]] = {
    val bs = blocks(s)
    if (bs.isEmpty) return None
    val out = Vector.newBuilder[Cue]
    var expect = 1
    bs.foreach { b =>
      if (b.length < 3) return None
      if (!b(0).forall(_.isDigit) || b(0).isEmpty) return None
      val idx = try b(0).toInt catch { case _: NumberFormatException => return None }
      if (idx != expect) return None
      val (st, en) = b(1) match {
        case SrtTime(h1, m1, s1, f1, h2, m2, s2, f2) =>
          (ms(h1, m1, s1, f1).getOrElse(return None),
            ms(h2, m2, s2, f2).getOrElse(return None))
        case _ => return None
      }
      if (en <= st) return None
      out += Cue(idx, st, en, b.drop(2))
      expect += 1
    }
    Some(out.result())
  }

  /** Parse WebVTT text: WEBVTT header, then cues (optional identifier
    * line, dot-millisecond timestamps, optional cue settings). Non-cue
    * blocks (NOTE/STYLE/REGION) are accepted per [[parseVttDoc]]'s
    * rules; this entry returns just the cues.
    */
  def parseVtt(s: String): Option[Vector[Cue]] =
    parseVttDoc(s).map(_.cues)

  /** Parse a full WebVTT document: the cue walk of [[parseVtt]] plus
    * NOTE comment blocks (anywhere; a comment must not contain
    * `-->`), STYLE blocks (CSS lines collected), and REGION blocks —
    * the latter two legal only BEFORE the first cue (spec rule,
    * enforced: one after a cue rejects the document). Per-cue settings
    * after the end timestamp are captured verbatim on the cue.
    */
  def parseVttDoc(s: String): Option[VttDoc] = {
    val bs = blocks(s)
    if (bs.isEmpty) return None
    val hdr = bs.head
    if (hdr.isEmpty || !(hdr.head == "WEBVTT" || hdr.head.startsWith("WEBVTT ")))
      return None
    val out = Vector.newBuilder[Cue]
    var i = 1
    var nNotes = 0
    var nStyles = 0
    var nRegions = 0
    val style = new StringBuilder
    var sawCue = false
    bs.drop(1).foreach { b =>
      val head = b.head
      if (head == "NOTE" || head.startsWith("NOTE ")) {
        // a comment block must not contain the cue-timing arrow
        if (b.exists(_.contains("-->"))) return None
        nNotes += 1
      } else if (head == "STYLE") {
        if (sawCue || b.exists(_.contains("-->"))) return None
        if (style.nonEmpty) style.append('\n')
        style.append(b.drop(1).mkString("\n"))
        nStyles += 1
      } else if (head == "REGION") {
        if (sawCue || b.exists(_.contains("-->"))) return None
        nRegions += 1
      } else {
        // an optional identifier line precedes the timestamps
        val tsAt = if (head.contains("-->")) 0 else 1
        if (b.length < tsAt + 2) return None
        val (st, en, settings) = b(tsAt) match {
          case VttTime(h1, m1, s1, f1, h2, m2, s2, f2, setgs) =>
            (ms(h1, m1, s1, f1).getOrElse(return None),
              ms(h2, m2, s2, f2).getOrElse(return None),
              if (setgs == null) "" else setgs)
          case _ => return None
        }
        if (en <= st) return None
        out += Cue(i, st, en, b.drop(tsAt + 1), settings)
        i += 1
        sawCue = true
      }
    }
    val cs = out.result()
    if (cs.isEmpty) return None
    Some(VttDoc(cs, nNotes, nStyles, nRegions, style.toString))
  }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side).
  // ------------------------------------------------------------------

  private def stamp(t: Long, sep: Char): String = {
    val h = t / 3600000; val m = t / 60000 % 60
    val s = t / 1000 % 60; val f = t % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  /** Render cues as SRT text (CRLF-free LF form). */
  def renderSrt(cues: Seq[Cue]): String =
    cues.map(c => s"${c.index}\n${stamp(c.startMs, ',')} --> " +
      s"${stamp(c.endMs, ',')}\n${c.text}").mkString("", "\n\n", "\n")

  /** Render the same cues as WebVTT, with identifier lines. */
  def renderVtt(cues: Seq[Cue]): String =
    "WEBVTT\n\n" + cues.map(c => s"c${c.index}\n${stamp(c.startMs, '.')} --> " +
      s"${stamp(c.endMs, '.')}\n${c.text}").mkString("", "\n\n", "\n")

  /** Render a full WebVTT document: optional REGION and STYLE blocks
    * (before any cue, as the spec requires), leading NOTE comments,
    * then cues with their settings appended after the end timestamp
    * and NOTE blocks inserted after the cues named in `midNotes`
    * (0-based cue position -> comment text).
    */
  def renderVttRich(cues: Seq[Cue], regionLines: Seq[String],
      styleLines: Seq[String], notesBefore: Seq[String],
      midNotes: Map[Int, String]): String = {
    val sb = new StringBuilder("WEBVTT\n")
    if (regionLines.nonEmpty)
      sb.append('\n').append(("REGION" +: regionLines).mkString("\n")).append('\n')
    if (styleLines.nonEmpty)
      sb.append('\n').append(("STYLE" +: styleLines).mkString("\n")).append('\n')
    notesBefore.foreach(t => sb.append('\n').append(s"NOTE $t").append('\n'))
    cues.zipWithIndex.foreach { case (c, i) =>
      val tline = s"${stamp(c.startMs, '.')} --> ${stamp(c.endMs, '.')}" +
        (if (c.settings.nonEmpty) s" ${c.settings}" else "")
      sb.append('\n').append(s"c${c.index}\n$tline\n${c.text}").append('\n')
      midNotes.get(i).foreach(t => sb.append('\n').append(s"NOTE $t").append('\n'))
    }
    sb.toString
  }
}
