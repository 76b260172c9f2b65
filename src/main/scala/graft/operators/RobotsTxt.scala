package graft.operators

/** ROBOTS.TXT parse + evaluation (RFC 9309, the Robots Exclusion
  * Protocol): the crawl-politeness layer every web-corpus pipeline
  * must apply before a URL's content is even fetched — user-agent
  * groups, Allow/Disallow rules with the `*` wildcard and the `$`
  * end anchor, LONGEST-MATCH precedence with Allow winning length
  * ties, the `*` group as fallback, per-group Crawl-delay, and
  * group-independent Sitemap lines. Comments (`#`) strip to end of
  * line; directive names are case-insensitive; an empty Disallow
  * matches nothing (allow-all).
  *
  * Pure per-document functions (parse once, evaluate per URL — the
  * 100 TB shape is a broadcast of parsed policies joined to the URL
  * stream, or a per-row pair evaluation as in q268).
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, path: String)
  final case class Group(agents: Vector[String], rules: Vector[Rule],
      crawlDelay: Option[Long])
  final case class Robots(groups: Vector[Group], sitemaps: Vector[String]) {
    def nRules: Int = groups.map(_.rules.length).sum
  }

  /** Parse the file: groups start at their first User-agent line(s);
    * rules attach to the open group; rule lines before any group are
    * ignored (RFC: they belong to no group).
    */
  def parse(text: String): Robots = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.newBuilder[Rule]
    var delay: Option[Long] = None
    var open = false
    var collectingAgents = false
    val sitemaps = Vector.newBuilder[String]
    def flush(): Unit = {
      if (open) groups += Group(agents, rules.result(), delay)
      agents = Vector.empty
      rules = Vector.newBuilder[Rule]
      delay = None
      open = false
    }
    text.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!collectingAgents) flush()
            agents :+= value.toLowerCase
            open = true
            collectingAgents = true
          case "allow" | "disallow" if open =>
            collectingAgents = false
            if (value.nonEmpty) rules += Rule(key == "allow", value)
          case "crawl-delay" if open =>
            collectingAgents = false
            delay = value.toLongOption
          case "sitemap" =>
            sitemaps += value
          case _ =>
            collectingAgents = false // unknown directive: tolerated
        }
      }
    }
    flush()
    Robots(groups.result(), sitemaps.result())
  }

  /** Rule-path match: literal segments, `*` spans anything, a trailing
    * `$` anchors the end.
    */
  private[operators] def pathMatches(rule: String, path: String): Boolean = {
    val (body, anchored) =
      if (rule.endsWith("$")) (rule.dropRight(1), true) else (rule, false)
    val parts = body.split("\\*", -1)
    // first part must match at the start; the rest greedily in order
    var at = 0
    var first = true
    parts.foreach { seg =>
      if (first) {
        if (!path.startsWith(seg)) return false
        at = seg.length
        first = false
      } else {
        val i = path.indexOf(seg, at)
        if (i < 0) return false
        at = i + seg.length
      }
    }
    if (anchored) {
      // the last literal segment must reach the end (a trailing * spans)
      if (parts.last.isEmpty) true else at == path.length
    } else true
  }

  /** The group a user agent resolves to: an exact (case-insensitive)
    * product-token group first, the `*` group as fallback.
    */
  def groupFor(r: Robots, agent: String): Option[Group] = {
    val a = agent.toLowerCase
    r.groups.find(_.agents.contains(a))
      .orElse(r.groups.find(_.agents.contains("*")))
  }

  /** RFC 9309 evaluation: the longest matching rule wins; Allow wins
    * length ties; no matching rule (or no group) = allowed.
    */
  def isAllowed(r: Robots, agent: String, path: String): Boolean =
    groupFor(r, agent) match {
      case None => true
      case Some(g) =>
        val hits = g.rules.filter(rl => pathMatches(rl.path, path))
        if (hits.isEmpty) true
        else {
          val best = hits.maxBy(rl => (rl.path.length, rl.allow))
          best.allow
        }
    }
}
