package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the parsers must never throw on arbitrary input, node
  * spans must stay within bounds and properly nested, and strip/render must
  * be total for any parse result.
  */
class ParserPropertySpec extends AnyFunSuite {
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val markupChar = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('[', ']', '/', '=', '\\', '\'', '"', ' ', '*', '\n', '\r', '<', '>', '&', '!', '-', '`', '\t'))

  private val soup: Gen[String] = for {
    n <- Gen.choose(0, 200)
    cs <- Gen.listOfN(n, markupChar)
  } yield cs.mkString

  private val tagged: Gen[String] = {
    val frag = Gen.oneOf("[b]", "[/b]", "[code]", "[/code]", "[*]", "[list]", "[/list]",
      "[emoji]", "[url=x]", "[font a=1 b=\"2\"]", "text ", "\\[b]", "<a>", "</a>",
      "<br/>", "<!-- c -->", "<img src='x'>", "x\ny", "[", "]", "<", ">")
    for { n <- Gen.choose(0, 30); fs <- Gen.listOfN(n, frag) } yield fs.mkString
  }

  private def structurallySound(d: Doc): Boolean = {
    val len = d.source.length
    def ok(n: Node, lo: Int, hi: Int): Boolean = n match {
      case t: TextNode => t.begin >= lo && t.end <= hi && t.begin <= t.end
      case t: TagNode =>
        t.begin >= lo && t.end <= hi && t.begin <= t.end &&
          t.children.forall(c => ok(c, t.begin, math.max(t.end, t.begin)))
    }
    d.children.forall(c => ok(c, 0, len))
  }

  private def totalPipeline(s: String): Boolean = {
    val d1 = BBCodeParser.parse(s, TagAttributes.bbcodeCanonical)
    val d2 = HtmlParser.parse(s, Map.empty)
    val o = new Offsets
    Transform.textTransform(d1)
    Transform.textTransform(d1, fn = Transform.htmlEscape(o, TagAttributes.bbcodeCanonical))
    Transform.textTransform(d2)
    BBCodeToHtml(d1)
    structurallySound(d1) && structurallySound(d2)
  }

  test("never throws + sound spans on random soup") {
    check(Prop.forAll(soup)(s => totalPipeline(s)))
  }

  test("never throws + sound spans on fragment compositions") {
    check(Prop.forAll(tagged)(s => totalPipeline(s)))
  }

  test("strip of markup-free text is identity") {
    val plain = Gen.listOf(Gen.frequency(9 -> Gen.alphaNumChar, 1 -> Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(plain) { s =>
      Transform.textTransform(BBCodeParser.parse(s, TagAttributes.bbcodeCanonical)) == s
    })
  }
}
