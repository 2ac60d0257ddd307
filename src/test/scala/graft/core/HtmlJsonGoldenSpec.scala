package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** The reference ships three golden Document→JSON files for real HTML pages
  * (reference: HTMLParserFileTest.groovy:69-84, html/json/{custom,
  * github.com,svg}.json, Apache-2.0, copied verbatim into
  * test/resources/htmlgolden). This suite parses the same sources with our
  * HTML FSM (empty config = built-in defaults, exactly as the reference
  * test does) and compares the full serialized tree — every span, name
  * index, attribute map, and both offset sets — node-for-node against the
  * reference's own goldens.
  */
class HtmlJsonGoldenSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  /** Serialize our Doc in the reference's Jackson-proxy shape
    * (reference: test/.../jackson/ProxyModule.java:31-40).
    */
  private def toRefJson(doc: Doc): JsonNode = {
    def nodeJson(n: Node): JsonNode = n match {
      case t: TextNode =>
        val o = nf.objectNode()
        o.put("begin", t.begin); o.put("end", t.end); o.put("body", t.body)
        o
      case t: TagNode =>
        val o = nf.objectNode()
        o.put("begin", t.begin); o.put("end", t.end)
        o.put("nameEnd", t.nameEnd)
        o.put("bodyBegin", t.bodyBegin); o.put("bodyEnd", t.bodyEnd)
        if (t.name == null) o.putNull("name") else o.put("name", t.name)
        if (t.attribute == null) o.putNull("attribute") else o.put("attribute", t.attribute)
        val attrs = nf.objectNode()
        t.attributes.foreach { case (k, v) => attrs.put(k, v) }
        o.set[ObjectNode]("attributes", attrs)
        val kids = nf.arrayNode()
        t.children.foreach(c => kids.add(nodeJson(c)))
        o.set[ObjectNode]("children", kids)
        o
    }
    def offsetArr(set: OffsetSet): JsonNode = {
      val arr = nf.arrayNode()
      set.foreachPair { (a, b) =>
        val p = nf.objectNode(); p.put("first", a); p.put("second", b); arr.add(p)
      }
      arr
    }
    val o = nf.objectNode()
    o.put("begin", 0); o.put("end", doc.source.length)
    o.set[ObjectNode]("offsets", offsetArr(doc.offsets))
    o.set[ObjectNode]("attributeOffsets", offsetArr(doc.attributeOffsets))
    val kids = nf.arrayNode()
    doc.children.foreach(c => kids.add(nodeJson(c)))
    o.set[ObjectNode]("children", kids)
    o
  }

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/htmlgolden/$name")
    require(in != null, s"missing $name")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  for (page <- Seq("custom", "github.com", "svg")) {
    test(s"HTML parse of $page.html equals the reference's shipped JSON golden") {
      val doc = HtmlParser.parse(resource(s"$page.html"), Map.empty)
      val actual = toRefJson(doc)
      val expected = mapper.readTree(resource(s"$page.json"))
      // Jackson JsonNode equality is structural and order-insensitive for
      // object fields — the same regime as the reference's own test.
      assert(actual == expected,
        s"$page: tree mismatch\nexpected head: ${expected.toString.take(400)}\nactual head:   ${actual.toString.take(400)}")
    }
  }
}
