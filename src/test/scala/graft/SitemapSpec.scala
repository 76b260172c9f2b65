package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sitemap
import graft.operators.Sitemap.Entry

/** Sitemap XML walk: urlset/sitemapindex round trips, entity decode
  * in loc URLs, strict-tiling malformation rules.
  */
class SitemapSpec extends AnyFunSuite {

  private val entries = Seq(
    Entry("https://ex.org/a?x=1&y=2", Some("2024-01-02"), Some("daily"),
      Some("0.8")),
    Entry("https://ex.org/plain", None, None, None),
    Entry("https://ex.org/<odd>", Some("2024-03-04"), None, None))

  test("urlset round trip: entities in loc decode back exactly") {
    val xml = Sitemap.render(isIndex = false, entries)
    assert(xml.contains("x=1&amp;y=2")) // the wire form is encoded
    assert(xml.contains("&lt;odd&gt;"))
    val s = Sitemap.parse(xml).get
    assert(!s.isIndex && s.nEntries == 3)
    assert(s.entries.map(_.loc) == entries.map(_.loc).toVector)
    assert(s.entries(0).lastmod.contains("2024-01-02"))
    assert(s.entries(0).priority.contains("0.8"))
    assert(s.entries(1).lastmod.isEmpty)
  }

  test("sitemapindex files parse with the sitemap entry tag") {
    val xml = Sitemap.render(isIndex = true,
      Seq(Entry("https://ex.org/s1.xml", Some("2024-05-06"), None, None)))
    val s = Sitemap.parse(xml).get
    assert(s.isIndex && s.nEntries == 1)
    assert(s.entries.head.loc == "https://ex.org/s1.xml")
    // a urlset root with sitemap children rejects (tag mismatch)
    assert(Sitemap.parse(xml.replace("sitemapindex", "urlset")).isEmpty)
  }

  test("malformations reject: bad root, no loc, unknown entity, garbage") {
    assert(Sitemap.parse("<rss><item/></rss>").isEmpty)
    assert(Sitemap.parse("<urlset><url><lastmod>x</lastmod></url></urlset>").isEmpty)
    assert(Sitemap.parse("<urlset><url><loc>a&copy;b</loc></url></urlset>").isEmpty)
    assert(Sitemap.parse("<urlset><url><loc>a</loc></url></urlset>junk").isEmpty)
    assert(Sitemap.parse("<urlset><url><loc>a</loc>").isEmpty) // unterminated
    assert(Sitemap.parse(
      "<urlset><url><loc>a</loc><loc>b</loc></url></urlset>").isEmpty)
    assert(Sitemap.parse("").isEmpty)
  }
}
