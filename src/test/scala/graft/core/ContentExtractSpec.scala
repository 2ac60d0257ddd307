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
