package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Small-surface API semantics not covered by the fixture suite. */
class CoreApiSpec extends AnyFunSuite {

  test("TagAttributes.validate rules") {
    // preformatted body requires a closing tag and must not be standalone
    assert(!TagAttributes(doesNotRequireClosingTag = true, hasPreFormattedBody = true, standalone = false, transformNewLines = true).validate)
    assert(!TagAttributes(doesNotRequireClosingTag = false, hasPreFormattedBody = true, standalone = true, transformNewLines = true).validate)
    // noClosingTag must not be standalone
    assert(!TagAttributes(doesNotRequireClosingTag = true, hasPreFormattedBody = false, standalone = true, transformNewLines = true).validate)
    // valid combos
    assert(TagAttributes(doesNotRequireClosingTag = true, hasPreFormattedBody = false, standalone = false, transformNewLines = true).validate)
    assert(TagAttributes(doesNotRequireClosingTag = false, hasPreFormattedBody = true, standalone = false, transformNewLines = false).validate)
    assert(TagAttributes(doesNotRequireClosingTag = false, hasPreFormattedBody = false, standalone = true, transformNewLines = true).validate)
    // the canonical BBCode config validates...
    TagAttributes.bbcodeCanonical.values.foreach(a => assert(a.validate))
    // ...but the HTML void-element defaults (noClosingTag AND standalone)
    // deliberately do NOT — faithful to the reference, whose baked-in
    // defaults break its own validate() (validate is a caller-side check
    // the parser itself never invokes).
    assert(!TagAttributes.htmlDefaults("br").validate)
  }

  test("char[] parse entry point equals String entry point") {
    val s = "[b]x[/b] tail [code]p[/code]"
    val a = BBCodeParser.parse(s, TagAttributes.bbcodeCanonical)
    val b = BBCodeParser.parse(s.toCharArray, TagAttributes.bbcodeCanonical)
    assert(DocJson.doc(a) == DocJson.doc(b))
    val h1 = HtmlParser.parse("<b>x</b>", Map.empty)
    val h2 = HtmlParser.parse("<b>x</b>".toCharArray, Map.empty)
    assert(DocJson.doc(h1) == DocJson.doc(h2))
  }

  test("node accessors: rawString, length, getString, childTagNodes, hasBody/hasClosingTag") {
    val doc = BBCodeParser.parse("a[b]x[i]y[/i][/b]c[emoji]", TagAttributes.bbcodeCanonical)
    val tags = doc.tagNodes
    assert(tags.map(_.name) == List("b", "i", "emoji"))
    val b = tags.head
    assert(b.rawString == "[b]x[i]y[/i][/b]")
    assert(b.length == "[b]x[i]y[/i][/b]".length)
    assert(b.hasBody && b.hasClosingTag)
    assert(b.childTagNodes.map(_.name) == List("b", "i"))
    val emoji = tags.last
    assert(!emoji.hasBody && !emoji.hasClosingTag)
    assert(doc.getString(1, 4) == "[b]")
  }

  test("name caching stays correct through nameEnd mutation") {
    val doc = new Doc("xabc]".toCharArray)
    val t = new TagNode(doc, null, 0)
    assert(t.name == null) // nameEnd = -1
    t.nameEnd = 4
    assert(t.name == "abc")
    t.nameEnd = 3
    assert(t.name == "ab")
  }

  test("lookupKey: ascii-lowercase identity, uppercase/unicode fall back") {
    assert(TagAttributes.lookupKey("bold").eq("bold")) // no allocation
    assert(TagAttributes.lookupKey("BoLd") == "bold")
    assert(TagAttributes.lookupKey("ÄBC") == "äbc")
  }
}
