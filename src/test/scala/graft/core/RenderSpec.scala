package graft.core

import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Renderer semantics ports: the reference's transformer exact-equality
  * cases (FreemarkerTransformerTest.java:46-260, re-expressed with native
  * renderers), the BBCode→HTML inline table and file goldens
  * (BBCodeToHTMLTransformerSpec.groovy), and the strip cases with
  * non-trivial predicates (TextTransformerTest.java:37-58).
  */
class RenderSpec extends AnyFunSuite {
  import Render.TagRenderer

  private val parseAttrs = Map(
    "noparse" -> TagAttributes(false, true, false, true),
    "code" -> TagAttributes(false, true, false, true),
    "*" -> TagAttributes(true, false, false, true))

  private def parse(s: String): Doc = BBCodeParser.parse(s, parseAttrs)

  // Custom renderer registry mirroring the reference test's inline templates
  private def wrapTag(t: String): TagRenderer = (_, body) => s"<$t>$body</$t>"
  private val testRenderers: Map[String, TagRenderer] = Map(
    "a" -> wrapTag("aaaaaa"),
    "b" -> wrapTag("bbbbbb"),
    "c" -> wrapTag("cccccc"),
    "d" -> ((tag, body) => {
      val attrs = tag.attributes.iterator.map { case (k, v) => s""" $k="$v"""" }.mkString
      s"<dddddd$attrs>$body</dddddd>"
    }),
    "*" -> wrapTag("li"),
    "nobody" -> ((_, _) => "<p>no body here</p>"),
    "list" -> wrapTag("ul"),
    "change" -> ((_, body) => s"<change>${body.replace("", "|")}</change>"),
    "wrap" -> ((_, body) => s"<wrap>left${body}right</wrap>"),
    "bad" -> ((_, _) => throw new IllegalStateException("missing_method"))
  )

  private def assertTransform(strict: Boolean, doc: Doc, predicate: TagNode => Boolean,
                              attributes: Map[String, TagAttributes], expected: String,
                              expectedOffsets: List[(Int, Int)]): Unit = {
    val offsets = new Offsets
    val attrs = if (attributes == null) Map.empty[String, TagAttributes] else attributes
    val actual = Render.transform(doc, testRenderers, strict, predicate,
      Transform.htmlEscape(offsets, attrs))
    assert(offsets.pairs.toList == expectedOffsets)
    assert(actual == expected)
  }

  private def bothStrictness(f: Boolean => Unit): Unit = { f(true); f(false) }

  test("computedOffset algebra") {
    val o = new Offsets
    o.add(0, 1); o.add(1, 2); o.add(1, 3); o.add(10, 5); o.add(12, 50)
    assert(o.computeOffsetFromIndex(0) == 1)
    assert(o.computeOffsetFromIndex(1) == 6)
    assert(o.computeOffsetFromIndex(2) == 6)
    assert(o.computeOffsetFromIndex(10) == 11)
    assert(o.computeOffsetFromIndex(11) == 11)
    assert(o.computeOffsetFromIndex(12) == 61)
    assert(o.computeOffsetFromIndex(13) == 61)
    assert(o.computeOffsetFromIndex(14) == 61)
  }

  test("errorBadTemplate") {
    val doc = parse("[bad testattr=33]xyz[/bad]")
    val e = intercept[TransformException] {
      assertTransform(strict = true, doc, _ => true, null, null, Nil)
    }
    assert(e.getMessage.startsWith("Rendering failed"))
  }

  test("errorStrictMissingTag") {
    val doc = parse("[missing testattr=33]xyz[/missing]")
    val e = intercept[TransformException] {
      assertTransform(strict = true, doc, _ => true, null, null, Nil)
    }
    assert(e.getMessage == "No template found for tag [missing]")
  }

  test("escapeHTMLWithOffsets") {
    bothStrictness { strict =>
      val doc = parse("A<>B&C<>D [b] f(x) = x < y > z &\r\n f(y) = \"Yo!\"\n [/b] A<>B&C<>D")
      val expected = "A&lt;&gt;B&amp;C&lt;&gt;D <bbbbbb> f(x) = x &lt; y &gt; z &amp;<br> f(y) = &quot;Yo!&quot;<br> </bbbbbb> A&lt;&gt;B&amp;C&lt;&gt;D"
      val expectedOffsets = List((1, 3), (2, 3), (4, 4), (6, 3), (7, 3), (23, 3), (27, 3),
        (31, 4), (32, 2), (42, 5), (46, 5), (47, 3), (55, 3), (56, 3), (58, 4), (60, 3), (61, 3))
      assertTransform(strict, doc, _ => true, null, expected, expectedOffsets)
    }
  }

  test("nestedNodesAreNotTransformedIfParentFailsPredicate") {
    bothStrictness { strict =>
      val doc = parse("[list] [*] foo [*] bar [/list]")
      assertTransform(strict, doc, n => n.name != "list", null,
        "[list] [*] foo [*] bar [/list]", Nil)
    }
  }

  test("prefixAndSuffix") {
    bothStrictness { strict =>
      assertTransform(strict, parse("abc[b] bbb [/b]123"), _ => true, null,
        "abc<bbbbbb> bbb </bbbbbb>123", Nil)
    }
  }

  test("simpleOffsets") {
    bothStrictness { strict =>
      assertTransform(strict, parse("1[a]2[b]3[/b]4[/a]5"), _ => true, null,
        "1<aaaaaa>2<bbbbbb>3</bbbbbb>4</aaaaaa>5", Nil)
    }
  }

  test("soloAttributes") {
    bothStrictness { strict =>
      assertTransform(strict, parse("[d testattr=33]xyz[/d]"), _ => true, null,
        "<dddddd testattr=\"33\">xyz</dddddd>", Nil)
    }
  }

  test("templateChangesBody") {
    bothStrictness { strict =>
      assertTransform(strict, parse("[change] foo [/change]"), _ => true, null,
        "<change>| |f|o|o| |</change>", Nil)
    }
  }

  test("templateWrapsBody") {
    bothStrictness { strict =>
      assertTransform(strict, parse("[wrap] foo [/wrap]"), _ => true, null,
        "<wrap>left foo right</wrap>", Nil)
    }
  }

  test("transformedResult") {
    bothStrictness { strict =>
      assertTransform(strict, parse("[b] bbb [/b]"), _ => true, null,
        "<bbbbbb> bbb </bbbbbb>", Nil)
    }
  }

  test("withEmbedding") {
    bothStrictness { strict =>
      assertTransform(strict, parse("[a]123[c]xyz[/c][/a]"), _ => true, null,
        "<aaaaaa>123<cccccc>xyz</cccccc></aaaaaa>", Nil)
    }
  }

  test("withEmbeddingAndAdjacentTags") {
    bothStrictness { strict =>
      assertTransform(strict, parse("123[b]abc[/b] [a]123[c]xyz[/c][/a] 456"), _ => true, null,
        "123<bbbbbb>abc</bbbbbb> <aaaaaa>123<cccccc>xyz</cccccc></aaaaaa> 456", Nil)
    }
  }

  test("withEmbeddingAndAdjacentTagsAndAttributes") {
    bothStrictness { strict =>
      assertTransform(strict, parse("123[b]abc[/b] [a]123[d testattr=33]xyz[/d][/a] 456"), _ => true, null,
        "123<bbbbbb>abc</bbbbbb> <aaaaaa>123<dddddd testattr=\"33\">xyz</dddddd></aaaaaa> 456", Nil)
    }
  }

  test("withEmbeddingAndAdjacentTagsAndAttributesAndSingleBBCodeTag") {
    bothStrictness { strict =>
      assertTransform(strict, parse("123[list]abc[*][/list] [a]123[d testattr=33]xyz[/d][/a] 456"), _ => true, null,
        "123<ul>abc<li></li></ul> <aaaaaa>123<dddddd testattr=\"33\">xyz</dddddd></aaaaaa> 456", Nil)
    }
  }

  test("withEmbeddingAndNonTransformed...SingleBBCodeTag") {
    bothStrictness { strict =>
      assertTransform(strict, parse("123[b]abc[*][/b] [a]123[d testattr=33]xyz[/d][/a] 456"),
        n => n.name != "b", null,
        "123[b]abc[*][/b] <aaaaaa>123<dddddd testattr=\"33\">xyz</dddddd></aaaaaa> 456", Nil)
    }
  }

  test("withEmbeddingNoLeadingTextNode") {
    bothStrictness { strict =>
      assertTransform(strict, parse("[list][*]item1[*]item2[/list]"), _ => true, null,
        "<ul><li>item1</li><li>item2</li></ul>", Nil)
    }
  }

  test("withEmbeddingNewlineTransformDisabled") {
    bothStrictness { strict =>
      val doc = parse("[list]\n\t[*]item1\n\t[*]item2\n[/list]")
      val attributes = Map(
        "list" -> TagAttributes(false, false, false, false),
        "*" -> TagAttributes(false, false, false, false))
      assertTransform(strict, doc, _ => true, attributes,
        "<ul>\n\t<li>item1\n\t</li><li>item2\n</li></ul>", Nil)
    }
  }

  test("withManyEmbeddingsAndAdjacentTags") {
    bothStrictness { strict =>
      assertTransform(strict, parse("123[b]abc[a][c]wow[/c][/a][/b] [a]123[c]xyz[/c][/a] 456"), _ => true, null,
        "123<bbbbbb>abc<aaaaaa><cccccc>wow</cccccc></aaaaaa></bbbbbb> <aaaaaa>123<cccccc>xyz</cccccc></aaaaaa> 456", Nil)
    }
  }

  test("NodeConsumer receives every transformed node") {
    val doc = parse("1[a]2[b]3[/b]4[/a]5")
    var taps = List.empty[(String, String, String)]
    Render.transform(doc, testRenderers, strict = false, _ => true, null,
      (n, result, newBody) => {
        val kind = n match { case t: TagNode => s"tag:${t.name}"; case _: TextNode => "text" }
        taps ::= ((kind, result, newBody))
      })
    assert(taps.reverse == List(
      ("text", "1", "1"), ("text", "2", "2"), ("text", "3", "3"),
      ("tag:b", "<bbbbbb>3</bbbbbb>", "3"), ("text", "4", "4"),
      ("tag:a", "<aaaaaa>2<bbbbbb>3</bbbbbb>4</aaaaaa>", "2<bbbbbb>3</bbbbbb>4"),
      ("text", "5", "5")))
  }

  // ---- strip with predicates (TextTransformerTest.java:38-58) -------------

  test("bbCodeToText with predicates") {
    def strip(s: String, p: TagNode => Boolean): String =
      Transform.textTransform(parse(s), predicate = p)
    assert(strip("[foo bar=\"blah blah\"]Some ordinary text.[/foo] [font=\"verdana\"]Hello[/font]", _ => false) ==
      "[foo bar=\"blah blah\"]Some ordinary text.[/foo] [font=\"verdana\"]Hello[/font]")
    assert(strip("[list] [*] foo [*] bar [/list] [b]bold[/b]", n => n.name != "list") ==
      "[list] [*] foo [*] bar [/list] bold")
    assert(strip("\\[b]Hello World\\[/b]", _ => true) == "[b]Hello World[/b]")
  }

  // ---- BBCode→HTML built-in registry --------------------------------------

  private def toHtml(bbCode: String): String =
    BBCodeToHtml(BBCodeParser.parse(bbCode, Map(
      "*" -> TagAttributes(true, false, false, true),
      "code" -> TagAttributes(false, true, false, true),
      "noparse" -> TagAttributes(false, true, false, true))))

  /** Inline table from BBCodeToHTMLTransformerSpec.groovy:63-98, compared
    * with the spec's own normalization (strip spaces, `<br>`, `&nbsp;`).
    */
  test("BBCode to HTML - simple (35 inline rows)") {
    val rows = List(
      ("<strong>bold</strong> No format. <strong>bold</strong>", "[b]bold[/b]No format.[b]bold[/b]"),
      ("<strong>bold <em>italic embedded</em> bold</strong>", "[b]bold[i]italic embedded[/i]bold[/b]"),
      ("<a href=\"http://foo.com\">http://foo.com</a>", "[url]http://foo.com[/url]"),
      ("<ul><li>item1</li><li>item2</li></ul>", "[list][*]item1[*]item2[/list]"),
      ("<ul><li>item1</li><li>item2</li></ul>", "[list][li]item1[/li][li]item2[/li][/list]"),
      ("<ul><li>1</li><li>2</li></ul>", "[list][*]1[*]2[/list]"),
      ("<ul><li><strong><em>1</em></strong></li><li><strong><em>2</em></strong></li></ul>", "[list][*][b][i]1[/i][/b][*][b][i]2[/i][/b][/list]"),
      ("<table><tr><td>Row1 Column1</td><td>Row1 Column2</td></tr><tr><td>Row2 Column1</td><td>Row2 Column2</td></tr></table>", "[table][tr][td]Row1 Column1[/td][td]Row1 Column2[/td][/tr][tr][td]Row2 Column1[/td][td]Row2 Column2[/td][/tr][/table]"),
      ("<table><tr><th>Header 1</th></tr><tr><td>Row1 Column1</td></tr></table>", "[table][tr][th]Header 1[/th][/tr][tr][td]Row1 Column1[/td][/tr][/table]"),
      ("<ol><li>item 1</li></ol>", "[ol][li]item 1[/li][/ol]"),
      ("<span style=\"text-decoration: line-through\">Strike</span>", "[s]Strike[/s]"),
      ("<u>Underline</u>", "[u]Underline[/u]"),
      ("<a href=\"http://foo.com\">http://foo.com</a>", "[url=http://foo.com]http://foo.com[/url]"),
      ("<a href=\"http://foo.com\">foo.com</a>", "[url=http://foo.com]foo.com[/url]"),
      ("Testing []", "Testing []"),
      ("<a href=\"mailto:barney@rubble.com\">barney</a>", "[email=barney@rubble.com]barney[/email]"),
      ("<a href=\"mailto:barney@rubble.com\">barney@rubble.com</a>", "[email=barney@rubble.com]barney@rubble.com[/email]"),
      ("Text <sub>subscript</sub> Other text", "Text [sub]subscript[/sub] Other text"),
      ("Text <sup>superscript</sup> Other text", "Text [sup]superscript[/sup] Other text"),
      ("Testing <div>[b] Testing [/b] [url]http://www.google.com[/url]</div> Text", "Testing [noparse][b] Testing [/b] [url]http://www.google.com[/url][/noparse] Text"),
      ("Test color is <span style=\"color: red\">red</span>.", "Test color is [color=red]red[/color]."),
      ("Test color is <span style=\"color: #FFF\">white</span>.", "Test color is [color=\"#FFF\"]white[/color]."),
      ("Test color is <span style=\"color: black\">black</span>.", "Test color is [color=\"black\"]black[/color]."),
      ("<div align=\"left\">Left</div>", "[left]Left[/left]"),
      ("<div align=\"center\">Center</div>", "[center]Center[/center]"),
      ("<div align=\"right\">Right</div>", "[right]Right[/right]"),
      ("<span style=\"font-family: monospace\">mono</span>", "[font=monospace]mono[/font]"),
      ("<strong>bold</strong> No format. <strong>bold</strong> <strong>bold</strong>", "[B]bold[/B]No format.[b]bold[/B] [B]bold[/b]"),
      ("<em>italic</em> No format. <em>italic</em> <em>italic</em>", "[I]italic[/I]No format.[i]italic[/I] [I]italic[/i]"),
      ("the <em>XY </em>Trainer", "the [I]XY [/I]Trainer"),
      ("<span style=\"font-family: times new roman\">Matthew(not 69) (175) </span>", "[font=times new roman]Matthew(not 69) (175) [/font]"),
      ("<u>&lt;script&gt; var inject=true;&lt;/script&gt;</u>", "[u]<script> var inject=true;</script>[/u]"),
      ("<div>Example: [code]foo[/code]</div>", "[noparse]Example: [code]foo[/code][/noparse]"),
      ("Example: [code]foo[/code]", "Example: \\[code]foo\\[/code]"),
      ("Example: [code]foo[/code]", "Example: \\[code]foo[/code]")
    )
    for (((html, bbCode), i) <- rows.zipWithIndex) {
      val actual = toHtml(bbCode).replaceAll(" ", "").replaceAll("<br>", "").replaceAll("&nbsp;", "")
      val expected = html.replaceAll(" ", "")
      assert(actual == expected, s"row $i: bbCode=$bbCode")
    }
  }

  test("renderEscaped (fused hot path) equals transform + htmlEscape") {
    val cfg = Map(
      "*" -> TagAttributes(true, false, false, true),
      "code" -> TagAttributes(false, true, false, true),
      "noparse" -> TagAttributes(false, true, false, true))
    val inputs = graft.pipeline.TranscriptGen.fragments ++ Seq(
      "", "plain", "[b]x[/b]\r\ny[i]z", "a & b < c \"d\"\n", "[code]k\nl[/code]",
      graft.pipeline.TranscriptGen.fragments.mkString)
    for (s <- inputs) {
      val d1 = BBCodeParser.parse(s, cfg)
      val o1 = new Offsets
      val expected = Render.transform(d1, BBCodeToHtml.renderers, strict = false,
        _ => true, Transform.htmlEscape(o1, cfg))
      val d2 = BBCodeParser.parse(s, cfg)
      val o2 = new Offsets
      val actual = Render.renderEscaped(d2, BBCodeToHtml.renderers, o2, cfg)
      assert(actual == expected, s"html mismatch for: $s")
      assert(o1.pairs == o2.pairs, s"offsets mismatch for: $s")
    }
  }

  /** File goldens, compared whitespace-insensitively like
    * BBCodeToHTMLTransformerSpec.groovy:112.
    */
  test("BBCode to HTML - complex (6 file goldens)") {
    for (name <- List("other", "code", "image", "size", "quote", "customer")) {
      def res(p: String) = {
        val in = getClass.getResourceAsStream(p)
        require(in != null, s"missing $p")
        Source.fromInputStream(in, "UTF-8").mkString
      }
      val bbCode = res(s"/bbcode/source/$name")
      val html = res(s"/bbcode/html/$name")
      val actual = toHtml(bbCode).replaceAll("<br>", "").replaceAll("\\s+", "")
      val expected = html.replaceAll("\\s+", "")
      assert(actual == expected, s"golden file: $name")
    }
  }
}
