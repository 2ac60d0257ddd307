package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source
import scala.jdk.CollectionConverters._

/** Golden-fixture suite: 3200+ inputs (every string literal in the
  * reference's own test sources, its file fixtures, the FIXTURES.md
  * fragment corpus, and seeded random bracket soup) were run through the
  * reference implementation compiled as-is; this suite asserts our core
  * produces an identical document tree, offsets, attributeOffsets, strip
  * output, escape output, and escape offsets for every one of them.
  */
class OracleFixtureSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def config(name: String): Map[String, TagAttributes] = name match {
    case "canonical" => TagAttributes.bbcodeCanonical
    case "nobr" =>
      TagAttributes.bbcodeCanonical ++ Map(
        "code" -> TagAttributes(false, true, false, false),
        "noparse" -> TagAttributes(false, true, false, false))
    case _ => Map.empty
  }

  private def lines: Iterator[String] = {
    val in = getClass.getResourceAsStream("/oracle_fixtures.jsonl")
    require(in != null, "oracle_fixtures.jsonl not on test classpath")
    Source.fromInputStream(in, "UTF-8").getLines()
  }

  test("all oracle fixtures match: doc tree, offsets, strip, escape") {
    var n = 0
    var failures = List.empty[String]
    for (line <- lines if line.nonEmpty) {
      val fx: JsonNode = mapper.readTree(line)
      if (!fx.has("error")) {
        n += 1
        val parserName = fx.get("parser").asText
        val configName = fx.get("config").asText
        val input = fx.get("input").asText
        val attrs = config(configName)

        def check(label: String, actual: String, expected: String): Unit =
          if (actual != expected && failures.size < 10)
            failures ::= s"[id=${fx.get("id")}] $label mismatch\n input=${input.take(200)}\n expected=$expected\n actual  =$actual"

        try {
          val doc =
            if (parserName == "html") HtmlParser.parse(input, attrs)
            else BBCodeParser.parse(input, attrs)
          val myDoc: JsonNode = mapper.readTree(DocJson.doc(doc))
          if (myDoc != fx.get("doc") && failures.size < 10)
            failures ::= s"[id=${fx.get("id")}] doc mismatch\n input=${input.take(200)}\n expected=${fx.get("doc")}\n actual  =$myDoc"

          check("strip", Transform.textTransform(doc), fx.get("strip").asText)

          val doc2 =
            if (parserName == "html") HtmlParser.parse(input, attrs)
            else BBCodeParser.parse(input, attrs)
          val offsets = new Offsets
          val escaped = Transform.textTransform(doc2, fn = Transform.htmlEscape(offsets, attrs))
          check("escape", escaped, fx.get("escape").asText)
          val expOff = fx.get("escapeOffsets").elements.asScala
            .map(p => (p.get(0).asInt, p.get(1).asInt)).toList
          if (offsets.pairs.toList != expOff && failures.size < 10)
            failures ::= s"[id=${fx.get("id")}] escapeOffsets mismatch\n input=${input.take(200)}\n expected=$expOff\n actual  =${offsets.pairs.toList}"
          if (offsets.total != fx.get("escapeTotal").asInt && failures.size < 10)
            failures ::= s"[id=${fx.get("id")}] escapeTotal mismatch"
        } catch {
          case e: Exception if failures.size < 10 =>
            failures ::= s"[id=${fx.get("id")}] threw ${e.getClass.getSimpleName}: ${e.getMessage}\n input=${input.take(200)}"
        }
      }
    }
    if (failures.nonEmpty) fail(s"${failures.size}+ fixture mismatches (showing up to 10):\n${failures.reverse.mkString("\n---\n")}")
    // floor = the committed corpus size: a stale or truncated resource
    // would otherwise pass this suite trivially
    assert(n >= 8304, s"fixture corpus shrank: consumed only $n rows")
  }
}
