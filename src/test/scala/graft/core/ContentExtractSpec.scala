package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ContentExtractSpec extends AnyFunSuite {

  test("article beats link-dense menu, header/footer boilerplate elided") {
    val html = """<html><body><header>Site Name And Slogan</header>""" +
      """<div class="menu"><a href="/a">Home page</a><a href="/b">About us</a>""" +
      """<a href="/c">Contact page</a></div>""" +
      """<article>The actual long running body text of the page that we want.</article>""" +
      """<footer>Copyright legal text</footer></body></html>"""
    assert(ContentExtract.mainContent(html) ==
      "The actual long running body text of the page that we want.")
  }

  test("no-link page falls back to the whole document minus boilerplate") {
    val html = "<p>short intro</p><script>var x = 1;</script><p>and the rest</p>"
    assert(ContentExtract.mainContent(html) == "short introand the rest")
  }

  test("comments and nested boilerplate are elided from the winner") {
    val html = """<div><!-- tracking --><p>keep this text please</p>""" +
      """<nav><a href="/x">big navigation block with lots of words</a></nav></div>"""
    assert(ContentExtract.mainContent(html) == "keep this text please")
  }

  test("bigger of two sibling content divs wins when links penalize the page root") {
    val html = """<div><a href="/1">one link</a><a href="/2">two link</a>""" +
      """<a href="/3">three link</a><a href="/4">four link</a></div>""" +
      """<div>tiny</div><div>this much longer div carries the real article body text</div>"""
    assert(ContentExtract.mainContent(html) ==
      "this much longer div carries the real article body text")
  }

  test("deterministic across calls") {
    val html = "<div>a</div><div>b</div>"
    assert(ContentExtract.mainContent(html) == ContentExtract.mainContent(html))
  }

  test("blog layout: sidebar tag cloud and nav lose to the article") {
    val body = "the quick brown fox jumps over the lazy dog " * 12
    val page = "<html><body>" +
      """<nav><a href="/1">Home</a><a href="/2">Blog</a><a href="/3">About</a></nav>""" +
      """<div class="sidebar"><a href="/t1">tag one</a><a href="/t2">tag two</a>""" +
      """<a href="/t3">tag three</a><a href="/t4">tag four words</a></div>""" +
      s"<article><h1>Title</h1><p>$body</p></article>" +
      "<footer>Copyright legal text</footer></body></html>"
    val main = ContentExtract.mainContent(page)
    assert(main.contains("quick brown fox"))
    assert(!main.contains("tag one") && !main.contains("Home") && !main.contains("Copyright"))
  }

  test("news layout: related-links box inside the article is outweighed by running text") {
    val p1 = "report text sentence with many informative words " * 10
    val p2 = "second paragraph of the story continues at length " * 8
    val page = "<html><body><header><div class=\"menu\">" +
      """<a href="/a">World</a><a href="/b">Sport</a><a href="/c">Tech</a></div></header>""" +
      s"<main><article><p>$p1</p>" +
      """<div class="related"><a href="/r1">related story one</a><a href="/r2">related story two</a></div>""" +
      s"<p>$p2</p></article></main>" +
      """<footer><a href="/priv">Privacy</a><a href="/terms">Terms</a></footer></body></html>"""
    val main = ContentExtract.mainContent(page)
    assert(main.contains("report text sentence") && main.contains("second paragraph"))
    assert(!main.contains("World") && !main.contains("Privacy"))
  }

  test("old-web table layout: nav cell loses to the content cell") {
    val story = "long running article text that fills the content cell " * 10
    val page = "<html><body><table><tr>" +
      """<td><a href="/n1">nav one</a><a href="/n2">nav two</a><a href="/n3">nav three</a></td>""" +
      s"<td><p>$story</p></td></tr></table></body></html>"
    val main = ContentExtract.mainContent(page)
    assert(main.contains("long running article text"))
    assert(!main.contains("nav one"))
  }

  test("real 60 KB github.com page: non-empty, script-free, narrower than the full strip") {
    val in = getClass.getResourceAsStream("/htmlgolden/github.com.html")
    require(in != null)
    val html = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val main = ContentExtract.mainContent(html)
    assert(main.nonEmpty)
    // script/style bodies that ARE present in the raw page must be elided
    assert(!main.contains("function("), main.take(200))
    // the winner is a proper subset of the full strip (which keeps script
    // bodies and nav text), and every chunk of the winner's text appears in
    // the page verbatim
    val full = Transform.textTransform(HtmlParser.parse(html, Map.empty))
    assert(main.length < full.length)
    assert(main.split("\\s+").filter(_.nonEmpty).take(20).forall(html.contains))
  }
}
