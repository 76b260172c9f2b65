package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobotsTxt

/** robots.txt parse + RFC 9309 evaluation: group resolution,
  * longest-match precedence, Allow tie wins, wildcards and anchors.
  */
class RobotsTxtSpec extends AnyFunSuite {

  private val txt =
    """# corpus crawler policy
      |User-agent: *
      |Disallow: /tmp/
      |Allow: /tmp/pub
      |Disallow: /cgi*.cgi
      |Allow: /exact$
      |Crawl-delay: 4
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow:
      |
      |Sitemap: https://example.com/sitemap.xml
      |""".stripMargin

  test("parse: groups, multi-agent headers, delays, sitemaps") {
    val r = RobotsTxt.parse(txt)
    assert(r.groups.length == 2)
    assert(r.groups(0).agents == Vector("*"))
    assert(r.groups(0).rules.length == 4) // the empty Disallow drops
    assert(r.groups(0).crawlDelay.contains(4L))
    assert(r.groups(1).agents == Vector("graftbot", "otherbot"))
    assert(r.groups(1).rules.isEmpty)
    assert(r.sitemaps == Vector("https://example.com/sitemap.xml"))
  }

  test("evaluation: longest match, allow ties, wildcards, anchors") {
    val r = RobotsTxt.parse(txt)
    def ok(agent: String, path: String) = RobotsTxt.isAllowed(r, agent, path)
    // the specific group (empty rules) allows everything for graftbot
    assert(ok("GraftBot", "/tmp/secret"))
    // anonymous crawlers resolve to *
    assert(!ok("randombot", "/tmp/secret"))
    assert(ok("randombot", "/tmp/pub/file")) // Allow /tmp/pub is longer
    assert(ok("randombot", "/elsewhere"))
    // wildcard: /cgi*.cgi
    assert(!ok("randombot", "/cgi-bin/run.cgi"))
    assert(ok("randombot", "/cgi-bin/run.sh"))
    // $ anchor: /exact$ allows only the exact path
    assert(ok("randombot", "/exact"))
    // unanchored /tmp/ still governs /exactmore? no rule matches -> allow
    assert(ok("randombot", "/exactmore"))
    // Allow wins a length tie: craft equal-length rules
    val tie = RobotsTxt.parse(
      "User-agent: *\nDisallow: /a/bb\nAllow: /a/bb\n")
    assert(RobotsTxt.isAllowed(tie, "x", "/a/bb/c"))
    // no groups at all -> everything allowed
    assert(RobotsTxt.isAllowed(RobotsTxt.parse("# empty\n"), "x", "/any"))
  }
}
