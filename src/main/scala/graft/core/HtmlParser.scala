package graft.core

import java.util.ArrayDeque
import scala.annotation.switch

/** HTML FSM parser sharing the malformed-input machinery with the BBCode
  * parser. Differences from BBCode: comment lexing (`<!-- -->` kept as
  * TextNodes), self-closing `/>`, boolean attributes stored as `"true"`,
  * whitespace-tolerant attribute lexing (incl. newlines), baked-in
  * void/raw-text tag defaults, no `\` escape, and no entity decoding.
  *
  * State transitions are a literal port of the reference's enum FSM
  * (reference: service/HTMLParser.java:260-554) as an `Int` jump table.
  */
object HtmlParser extends FsmBase {
  // FSM states (reference: HTMLParser.java State enum)
  private final val Start = 0
  private final val TagBegin = 1
  private final val TagName = 2
  private final val Attribute = 3
  private final val AttributeName = 4
  private final val AttributeValue = 5
  private final val DoubleQuotedAttributeValue = 6
  private final val SingleQuotedAttributeValue = 7
  private final val UnquotedAttributeValue = 8
  private final val OpeningTagSelfClose = 9
  private final val OpeningTagEnd = 10
  private final val ClosingTagBegin = 11
  private final val ClosingTagName = 12
  private final val ClosingTagEnd = 13
  private final val Text = 14
  private final val Bang = 15
  private final val BangDash = 16
  private final val InComment = 17
  private final val InCommentDash = 18
  private final val InCommentDashDash = 19
  private final val Complete = 20

  private def isWs(c: Char): Boolean = c == '\t' || c == '\n' || c == '\r' || c == ' '

  /** Transition function (reference: HTMLParser.java:260-554). */
  private def next(state: Int, c: Char): Int = (state: @switch) match {
    case Start =>
      if (c == '<') TagBegin else Text
    case TagBegin =>
      if (c == '/') ClosingTagBegin
      else if (Character.isWhitespace(c) || c == '<' || c == '>') Text // no tag name, e.g. <>
      else if (c == '!') Bang
      else TagName
    case TagName =>
      if (isWs(c)) Attribute
      else if (c == '>') OpeningTagEnd
      else if (c == '<') TagBegin
      else TagName
    case Attribute =>
      if (c == '>') OpeningTagEnd
      else if (c == '/') OpeningTagSelfClose
      else if (isWs(c)) Attribute // ignore whitespace
      else if (c == '<') TagBegin // tag is not closed properly
      else AttributeName
    case AttributeName =>
      if (c == '=') AttributeValue
      else if (isWs(c)) AttributeName // ignore whitespace
      else if (c == '<') TagBegin     // tag not closed properly
      else if (c == '>') OpeningTagEnd
      else if (c == '/') OpeningTagSelfClose
      else AttributeName
    case AttributeValue =>
      if (c == '<') TagBegin
      else if (c == '>') OpeningTagEnd
      else if (c == '/') OpeningTagSelfClose
      else if (isWs(c)) Attribute
      else if (c == '\'') SingleQuotedAttributeValue
      else if (c == '"') DoubleQuotedAttributeValue
      else UnquotedAttributeValue
    case DoubleQuotedAttributeValue =>
      if (c == '"') Attribute else DoubleQuotedAttributeValue
    case SingleQuotedAttributeValue =>
      if (c == '\'') Attribute else SingleQuotedAttributeValue
    case UnquotedAttributeValue =>
      // Disallowed characters in unquoted attribute values → text
      if (c == '"' || c == '\'' || c == '=' || c == '<' || c == '`') Text
      else if (isWs(c)) Attribute // any whitespace ends the attribute value
      else if (c == '>') OpeningTagEnd
      else UnquotedAttributeValue
    case OpeningTagSelfClose =>
      if (c == '>') OpeningTagEnd else Text
    case OpeningTagEnd =>
      if (c == '<') TagBegin else Text
    case ClosingTagBegin =>
      if (c == '>') ClosingTagEnd else ClosingTagName // '>' = no name of closing tag
    case ClosingTagName =>
      if (c == '>') ClosingTagEnd else ClosingTagName
    case ClosingTagEnd =>
      if (c == '<') TagBegin else Text
    case Text =>
      if (c == '<') TagBegin else Text
    case Bang =>
      if (c == '-') BangDash else Text
    case BangDash =>
      if (c == '-') InComment else Text
    case InComment =>
      if (c == '-') InCommentDash else InComment
    case InCommentDash =>
      if (c == '-') InCommentDashDash else InComment
    case InCommentDashDash =>
      if (c == '>') Text else InComment
    case Complete => Complete
  }

  def parse(source: String, tagAttributes: Map[String, TagAttributes]): Doc =
    parse(source.toCharArray, tagAttributes)

  def parse(source: Array[Char], tagAttributes: Map[String, TagAttributes]): Doc = {
    val doc = new Doc(source)
    // Defaults are overridden by any caller-specified keys
    // (reference: HTMLParser.java:45-54)
    val merged =
      if (tagAttributes == null) TagAttributes.htmlDefaults
      else TagAttributes.htmlDefaults ++ tagAttributes
    run(doc, merged)
    doc
  }

  /** FSM main loop (reference: HTMLParser.java:63-253). */
  private def run(doc: Doc, attributes: Map[String, TagAttributes]): Unit = {
    val nodes = new ArrayDeque[TagNode]()
    var textNode: TextNode = null
    var parsingEnabled = true

    var attributeName: String = null
    var attributeNameBegin = 0
    var attributeValueBegin = 0

    var state = Start
    var previous = Start
    var index = 0
    val source = doc.source
    val len = source.length

    while (index <= len) {
      previous = state
      if (index == len) state = Complete

      (state: @switch) match {
        case Start | BangDash | InComment | InCommentDash | ClosingTagBegin =>
          state = next(state, source(index))
          index += 1

        case Bang =>
          state = next(state, source(index))
          textNode = new TextNode(doc, nodes.peek(), index - 2, index)
          index += 1

        case TagBegin =>
          state = next(state, source(index))
          // No tags to end, malformed, set state to text
          if (state == ClosingTagBegin && nodes.isEmpty) {
            state = Text
          } else if (state == TagName && parsingEnabled) {
            nodes.push(new TagNode(doc, nodes.peek(), index - 1))
          }
          if (!nodes.isEmpty) {
            nodes.peek().bodyEnd = index - 1
          }
          // Increment only if not in text state (char re-examined)
          if (state != Text) index += 1

        case TagName =>
          state = next(state, source(index))
          if (parsingEnabled) {
            if (state == TagBegin) {
              handleUnexpectedState(doc, attributes, index, nodes)
            } else if (state != TagName) {
              nodes.peek().nameEnd = index
            }
          }
          index += 1

        case OpeningTagEnd =>
          if (parsingEnabled) {
            handleOpenTagCompleted(index, nodes)
            parsingEnabled = !hasPreFormattedBody(nodes.peek(), attributes)
            if (parsingEnabled && isStandalone(nodes.peek(), attributes)) {
              val tagNode = nodes.pop()
              tagNode.end = index
              addNode(doc, attributes, tagNode, nodes)
            }
          }
          state = next(state, source(index))
          index += 1

        case ClosingTagName =>
          state = next(state, source(index))
          index += 1
          if (state == ClosingTagEnd) {
            parsingEnabled = handleClosingTagName(doc, attributes, index, nodes, parsingEnabled)
          }

        case InCommentDashDash | OpeningTagSelfClose | ClosingTagEnd =>
          state = next(state, source(index))
          if (state == Text && textNode == null && parsingEnabled) {
            textNode = new TextNode(doc, nodes.peek(), index, index + 1)
          }
          index += 1

        case Attribute =>
          state = next(state, source(index))
          if (parsingEnabled) {
            if (state == AttributeName) attributeNameBegin = index
            else if (state == TagBegin) handleUnexpectedState(doc, attributes, index, nodes)
          }
          index += 1

        case AttributeName =>
          state = next(state, source(index))
          if (parsingEnabled) {
            if (state == AttributeValue) {
              attributeName = doc.getString(attributeNameBegin, index)
            } else if (state == TagBegin) {
              handleUnexpectedState(doc, attributes, index, nodes)
            } else if (state == OpeningTagEnd || state == OpeningTagSelfClose) {
              // Boolean attribute (reference: HTMLParser.java:193-198)
              attributeName = doc.getString(attributeNameBegin, index)
              nodes.peek().attributes.put(attributeName, "true")
              doc.attributeOffsets.add(index, 0)
            }
          }
          index += 1

        case AttributeValue =>
          state = next(state, source(index))
          if (parsingEnabled) {
            if (state == OpeningTagEnd) {
              nodes.peek().attributes.put(attributeName, "") // no value → empty string
              doc.attributeOffsets.add(index, 0)
            } else if (state == UnquotedAttributeValue) attributeValueBegin = index
            else if (state == SingleQuotedAttributeValue || state == DoubleQuotedAttributeValue)
              attributeValueBegin = index + 1
            else if (state == TagBegin) handleUnexpectedState(doc, attributes, index, nodes)
          }
          index += 1

        case DoubleQuotedAttributeValue | SingleQuotedAttributeValue | UnquotedAttributeValue =>
          state = next(state, source(index))
          if (parsingEnabled && state != previous) {
            nodes.peek().attributes.put(attributeName, doc.getString(attributeValueBegin, index))
            doc.attributeOffsets.add(attributeValueBegin, index - attributeValueBegin)
          }
          index += 1

        case Text =>
          state = next(state, source(index))
          if (textNode == null && parsingEnabled) {
            textNode = new TextNode(doc, nodes.peek(), index - 1, index)
          }
          if (state != Text && parsingEnabled) {
            textNode.end = index
            addNode(doc, attributes, textNode, nodes)
            textNode = null
          }
          index += 1

        case Complete =>
          handleDocumentCleanup(doc, attributes, index, nodes, textNode)
          index += 1
      }
    }
  }
}
